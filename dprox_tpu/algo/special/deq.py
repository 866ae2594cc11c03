"""Deep-equilibrium solver specialization.

Counterpart of /root/reference/dprox/algo/specialization/deq/solver.py.
The reference registers a torch backward hook that solves the adjoint
fixed point y = y J_f + g by Anderson (solver.py:42-52); here the same
math is a two-phase ``jax.custom_vjp``:

    fwd: z* = anderson(z -> f(theta, z))
    bwd: y* = anderson(y -> vjp_f_z(y) + g);  gtheta = vjp_f_theta(y*)

Gradients are exact at the equilibrium regardless of forward iteration
count; z0 receives zero gradient (the fixed point is init-independent).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Algorithm
from .fixed_point import FIXED_POINT_SOLVERS, anderson


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5))
def deq_fixed_point(f: Callable, theta, z0, f_thres: int = 40,
                    b_thres: int = 40, solver: str = "anderson"):
    """Differentiable fixed point of z = f(theta, z)."""
    engine = FIXED_POINT_SOLVERS[solver]
    return engine(lambda z: f(theta, z), z0, threshold=f_thres)


def _deq_fwd(f, theta, z0, f_thres, b_thres, solver):
    z_star = deq_fixed_point(f, theta, z0, f_thres, b_thres, solver)
    return z_star, (theta, z_star)


def _deq_bwd(f, f_thres, b_thres, solver, res, g):
    theta, z_star = res
    engine = FIXED_POINT_SOLVERS[solver]
    _, vjp_z = jax.vjp(lambda z: f(theta, z), z_star)
    y_star = engine(lambda y: vjp_z(y)[0] + g, jnp.zeros_like(g),
                    threshold=b_thres)
    _, vjp_theta = jax.vjp(lambda t: f(t, z_star), theta)
    (gtheta,) = vjp_theta(y_star)
    return gtheta, jnp.zeros_like(z_star)


deq_fixed_point.defvjp(_deq_fwd, _deq_bwd)


class DEQSolver:
    """Wrap a compiled Algorithm as a deep-equilibrium model.

    One whole solver iteration becomes the fixed-point map over the
    packed state (reference: solver.py:57-109). Learnable global (r, l)
    multipliers live in the explicit ``params`` dict under 'deq_r'/'deq_l'.

    ``precision``: jax matmul-precision context for the whole
    fixed-point solve, default ``"highest"``. Equilibrium solving needs
    the residual f(z)-z computed to accuracy finer than its own
    magnitude: under the TPU default-bf16 dot_general/conv accumulation,
    per-application noise in f reaches the scale of the residuals
    Anderson mixes, and the finite-budget solve stalls along the
    transient — measured 1.6 dB CPU/TPU divergence on the trained CSMRI
    DEQ grid, collapsing to 0.001 dB at HIGHEST
    (benchmarks/deq_divergence.py; pinning only the engine's own
    einsums was measured insufficient — the noise enters through f).
    Set ``precision=None`` to inherit the ambient default.

    ``anneal``: number of annealing LEVELS (default 1 = the plain single
    equilibrium). With L > 1, ``rhos``/``lams`` passed to ``solve`` are
    per-level schedules of length >= L (e.g. ``log_descent`` arrays) and
    the solve runs L successive equilibria, each conditioned on its
    level's (rho, sigma) and warm-started from the previous level's
    fixed point — the DEQ analog of PnP's strong-to-weak annealing, for
    the noiseless/low-noise regime where a single fixed point saturates
    in budget (VERDICT r4 #7; the reference's per-iteration param
    indexing is algo/base.py:128-172 there). ``f_thres`` applies PER
    LEVEL, so keep f_thres*anneal at the intended total budget.
    Training note: the implicit backward treats each level's
    warm start as a constant (equilibria are init-independent), so
    gradients reach the final level only — anneal at INFERENCE on a
    trained DEQ.
    """

    def __init__(self, solver: Algorithm, learned_params: bool = False,
                 f_thres: int = 40, b_thres: int = 40, solver_type: str = "anderson",
                 rhos=None, lams=None, precision: Optional[str] = "highest",
                 anneal: int = 1):
        self.internal = solver
        self.learned_params = learned_params
        self.f_thres = f_thres
        self.b_thres = b_thres
        self.solver_type = solver_type
        self.rhos = rhos
        self.lams = lams
        self.precision = precision
        self.anneal = max(1, int(anneal))
        self._jit_cache = {}

    def init_params(self):
        if not self.learned_params:
            return {}
        return {"deq_r": jnp.asarray(1.0), "deq_l": jnp.asarray(1.0)}

    def solve(self, x0=None, rhos=None, lams=None, params: Optional[dict] = None,
              jit: bool = True, real_output: bool = False, **kwargs):
        from ..base import encode_complex

        # _prepare_x0 keeps complex numpy host-side until the jit
        # boundary (complex h2d is unimplemented on axon), preserves
        # complex64 for complex jax arrays, and float32-casts real input
        x0 = Algorithm._prepare_x0(x0)
        params = dict(params) if params else {}
        if rhos is None:
            rhos = self.rhos
        if lams is None:
            lams = self.lams
        if self.anneal > 1:
            # a longer schedule (e.g. a 24-entry log_descent) provides
            # the first `anneal` levels
            def _trunc(v):
                try:
                    if len(v) > self.anneal:
                        return v[: self.anneal]
                except TypeError:
                    pass
                return v

            rhos = _trunc(rhos)
            lams = (jax.tree.map(_trunc, lams)
                    if isinstance(lams, (dict, list, tuple))
                    else _trunc(lams))
        rhos_arr, lam_list = self.internal.defaults(rhos, lams, self.anneal)

        run = self._solve_fn(real_output)
        traced = any(isinstance(l, jax.core.Tracer) for l in
                     jax.tree.leaves((x0, rhos_arr, lam_list, params)))
        if not jit or traced:
            # inside an outer trace (training loss under jax.grad/jit)
            # the call is inlined — nested jit would only leak tracers
            return run(encode_complex(x0), rhos_arr, lam_list,
                       encode_complex(params))
        # run() closes over the solver config at trace time, so every
        # config knob that shapes the traced program must key the cache
        # (mutating f_thres etc. after a solve would otherwise silently
        # reuse the stale compiled program)
        key = (real_output, self.learned_params, self.f_thres,
               self.b_thres, self.solver_type, self.precision, self.anneal)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key](encode_complex(x0), rhos_arr, lam_list,
                                    encode_complex(params))

    def _solve_fn(self, real_output: bool):
        """The whole DEQ solve as one traceable function of
        (x0, rhos, lam_list, params) with complex leaves encoded as
        {re, im} pairs at the boundary."""
        from ..base import decode_complex

        solver = self.internal

        def run(x0, rhos_arr, lam_list, params):
            if self.precision is not None:
                # trace-time context: the cached jit program bakes the
                # raised precision into every dot/conv of the solve
                with jax.default_matmul_precision(self.precision):
                    return body(x0, rhos_arr, lam_list, params)
            return body(x0, rhos_arr, lam_list, params)

        def body(x0, rhos_arr, lam_list, params):
            x0 = decode_complex(x0)
            params = decode_complex(params)
            L = self.anneal
            rho = rhos_arr[:L] if L > 1 else rhos_arr[0]
            lam = [(l[:L] if L > 1 else l[0]) for l in lam_list]
            if self.learned_params:
                r = params.get("deq_r", jnp.asarray(1.0))
                l = params.get("deq_l", jnp.asarray(1.0))
                rho = rho * r
                lam = [v * l for v in lam]

            state0 = solver.initialize(x0, params)
            z0 = solver.pack(state0)
            aux = solver.prepare_aux(x0, params)

            # Complex packed state (CSMRI) runs the fixed-point engine on
            # the isomorphic REAL vector [Re z; Im z]: the axon TPU
            # backend has no complex linalg.solve for Anderson's (m+1)^2
            # system, and the real view also sidesteps complex-vjp
            # conjugation conventions in the implicit backward pass. For
            # real states this is the identity path (no behavior change
            # vs the parity-pinned solve).
            if jnp.iscomplexobj(z0):
                cdtype = z0.dtype

                def c2r(z):
                    return jnp.concatenate([jnp.real(z), jnp.imag(z)],
                                           axis=-1)

                def r2c(zr):
                    half = zr.shape[-1] // 2
                    return (zr[..., :half]
                            + 1j * zr[..., half:]).astype(cdtype)
            else:
                c2r = r2c = lambda z: z

            def f(theta, z):
                rho_, lam_, params_ = theta
                state = solver.unpack(r2c(z))
                state = solver._iter(tuple(state), rho_, list(lam_), 0,
                                     params_, aux)
                return c2r(solver.pack(state))

            if L > 1:
                # strong-to-weak annealing: one equilibrium per schedule
                # level, warm-started from the previous level's fixed
                # point (see class docstring)
                def level(z, sched_k):
                    rho_k, lam_k = sched_k
                    z = deq_fixed_point(f, (rho_k, tuple(lam_k), params),
                                        z, self.f_thres, self.b_thres,
                                        self.solver_type)
                    return z, None

                z_star, _ = jax.lax.scan(level, c2r(z0), (rho, tuple(lam)))
            else:
                z_star = deq_fixed_point(f, (rho, tuple(lam), params),
                                         c2r(z0), self.f_thres,
                                         self.b_thres, self.solver_type)
            out = solver.unpack(r2c(z_star))[0]
            return jnp.real(out) if real_output else out

        return run

    def load(self, state):
        self.rhos = state.get("rhos")
        self.lams = state.get("lams")


def train_deq(solver: DEQSolver, step_fn=None, **kwargs):
    """Supervised DEQ training loop (reference: deq/training.py:12-116) —
    delegates to the shared optax loop."""
    from .training import train_supervised

    return train_supervised(step_fn=step_fn, **kwargs)
