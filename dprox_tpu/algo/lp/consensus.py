"""Scenario-parallel consensus ADMM for two-stage stochastic LPs.

Realizes the "block-separable consensus-ADMM over scenario batches,
multi-host" workload from BASELINE.json's north star (the reference is a
single-device library with no counterpart — SURVEY.md §2.6). The problem

    min_z  sum_s p_s [ c' x_s ]   s.t.  A_ub x_s <= b_ub,s
                                        A_eq x_s  = b_eq,s,  x_s >= 0
                                        x_s[shared_idx] = z   (nonanticipativity)

is solved by progressive hedging (consensus ADMM on the shared
first-stage block): each scenario solves an LP + quadratic
nonanticipativity penalty — a QP handled by the same OSQP-style
splitting as :class:`LPSolverADMM` with a diagonal quadratic term — and
the consensus variable is the probability-weighted mean of the scenario
first-stage iterates (``probs=None`` means equiprobable scenarios), one
``pmean`` per outer iteration over the mesh axis (ICI/DCN).

Stopping rule: the consensus (nonanticipativity) residual must reach
``tol`` and the worst scenario-subproblem primal infeasibility must
reach ``10*tol`` — the looser factor because the inner OSQP split only
enforces Ax in [lb, ub] asymptotically and r_p trails r_na by about an
order of magnitude along the whole trajectory.

TPU-first design points:

* The constraint matrix is shared across scenarios (only rhs varies), so
  equilibration runs once and every matvec is a multi-RHS apply
  ``A @ X`` with X (n, S_local) — a batched tile matmul on the MXU
  (``BSRMat.matmat``) instead of S separate gather/scatter matvecs.
* Scenario state is a leading batch axis, sharded over the mesh with
  ``shard_map``; the inner OSQP iterations and warm-started batched PCG
  are entirely device-local — the ONLY collective per outer iteration is
  the consensus ``pmean`` (plus a ``pmax`` in the per-chunk diagnostics).
* The outer/inner loops are ``lax.scan`` chunks jitted once; host code
  only checks convergence between chunks (same cadence as the
  single-problem LP solver, reference solvers.py:194-236).
"""
from __future__ import annotations

import time
from collections import defaultdict
from functools import partial
from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ...linalg.solvers import pcg as batched_pcg
from .utils import ruiz_equilibration_sparse, scipy_to_device_op


def _fetch_global(a):
    """np.asarray for arrays that may span processes: on a multi-process
    mesh, sharded states are not host-fetchable directly — allgather the
    global value (multi-host path, exercised by
    tests/test_multiprocess.py)."""
    if jax.process_count() > 1 and not a.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)


class ScenarioLP:
    """Preprocessed scenario family: one shared equilibrated constraint
    matrix, per-scenario bounds stacks.

    Parameters mirror :class:`LPProblem` (solvers.py) except ``b_eq_s``
    (and optionally ``b_ub_s``) carry a leading scenario axis.
    """

    def __init__(self, c, A_ub, b_ub, A_eq, b_eq_s, shared_idx,
                 b_ub_s=None, probs=None, dtype=jnp.float64):
        n = c.shape[0]
        # canonicalize up front: f64 without jax_enable_x64 means f32 —
        # make that explicit instead of warning on every jnp.asarray
        dtype = jax.dtypes.canonicalize_dtype(dtype)
        self.dtype = dtype
        A_ub = sp.csr_matrix(A_ub) if A_ub is not None else sp.csr_matrix((0, n))
        A_eq = sp.csr_matrix(A_eq) if A_eq is not None else sp.csr_matrix((0, n))
        b_eq_s = np.atleast_2d(np.asarray(b_eq_s, np.float64))
        S = b_eq_s.shape[0]
        if b_ub_s is None:
            b_ub = np.zeros(0) if b_ub is None else np.asarray(b_ub).ravel()
            b_ub_s = np.tile(b_ub[None], (S, 1))
        else:
            b_ub_s = np.atleast_2d(np.asarray(b_ub_s, np.float64))
        self.S = S
        self.m_ub, self.m_eq, self.n = A_ub.shape[0], A_eq.shape[0], n

        A = sp.vstack([A_ub, A_eq, sp.eye(n)])
        # equilibrate against the mean-scenario rhs; gammas are not used
        # (the consensus penalty lives in true units, so cost/rhs scaling
        # would have to be folded into rho_ph — keep it at 1)
        d, e, _, _, A_bar, Acnorm = ruiz_equilibration_sparse(
            A, np.asarray(c, np.float64),
            np.concatenate([b_ub_s.mean(0), b_eq_s.mean(0), np.full(n, np.inf)]))
        self.A, self.AT = scipy_to_device_op(A_bar, dtype)
        self.is_bsr = hasattr(self.A, "matmat")
        self.d = jnp.asarray(d, dtype)
        self.Acnorm = jnp.asarray(Acnorm, dtype)
        self.c = jnp.asarray(np.asarray(c).ravel(), dtype)
        self.shared_idx = np.asarray(shared_idx, np.int32)
        self.w = self.d[self.shared_idx]  # scaled->true factors, shared coords
        # scenario probabilities, normalized to mean 1 so a plain
        # (p)mean of pn*v is the probability-weighted mean; None =
        # equiprobable scenarios
        if probs is None:
            pn = np.ones(S)
        else:
            probs = np.asarray(probs, np.float64).ravel()
            if probs.shape[0] != S or (probs <= 0).any():
                raise ValueError(
                    f"probs must be {S} positive weights, got {probs.shape}")
            pn = S * probs / probs.sum()
        self.pn = jnp.asarray(pn, dtype)

        # per-scenario bounds in equilibrated row coordinates
        e = np.asarray(e)
        lb = np.concatenate([
            np.full((S, self.m_ub), -np.inf),
            b_eq_s * e[self.m_ub:self.m_ub + self.m_eq][None],
            np.zeros((S, n)),
        ], axis=1)
        ub = np.concatenate([
            b_ub_s * e[:self.m_ub][None],
            b_eq_s * e[self.m_ub:self.m_ub + self.m_eq][None],
            np.full((S, n), np.inf),
        ], axis=1)
        self.lb = jnp.asarray(lb, dtype)
        self.ub = jnp.asarray(ub, dtype)

    # batched applies: X (S, n) -> (S, m) and Y (S, m) -> (S, n)
    def apply_A(self, X):
        if self.is_bsr:
            return self.A.matmat(X.T).T
        return (self.A @ X.T).T

    def apply_AT(self, Y):
        if self.is_bsr:
            return self.AT.base.rmatmat(Y.T).T
        return (self.AT @ Y.T).T


class ConsensusLPSolver:
    """Progressive-hedging consensus ADMM over scenario batches.

    ``rho``/``sigma``/``alpha`` parameterize the inner OSQP splitting
    exactly as :class:`LPSolverADMM`; ``rho_ph`` is the nonanticipativity
    penalty. All four live in a params dict so the convergence-loss
    pretraining pattern of ``solve_lp`` applies unchanged.
    """

    def __init__(self, rho: float = 1.0, sigma: float = 1e-6,
                 alpha: float = 1.6, rho_ph: float = 1.0,
                 inner_steps: int = 10, dtype=jnp.float64,
                 verbose: bool = False):
        self.dtype = jax.dtypes.canonicalize_dtype(dtype)
        self.inner_steps = inner_steps
        self.verbose = verbose
        self._defaults = dict(rho=rho, sigma=sigma, alpha=alpha,
                              rho_ph=rho_ph)

    def init_params(self):
        d = self.dtype
        return {k: jnp.asarray(v, d) for k, v in self._defaults.items()}

    def solve_truncated(self, p: ScenarioLP, params, outer_iters: int = 5,
                        inner_steps: int = 3, unroll_pcg_iters: int = 15):
        """Differentiable truncated run (fixed-iteration unrolled CG, no
        host control flow) for convergence-loss hyperparameter
        pretraining — the consensus counterpart of
        ``LPSolverADMM.solve_truncated`` (reference pattern:
        problem.py:91-121). Returns (r_na, r_p, obj)."""
        from ...linalg.solvers import cg_unrolled

        dt = self.dtype
        S, n = p.S, p.n
        m = p.lb.shape[1]
        E = jnp.asarray(p.shared_idx)
        w = p.w
        cbar = p.d * p.c
        rho, sigma, alpha, rho_ph = (params["rho"], params["sigma"],
                                     params["alpha"], params["rho_ph"])
        Pvec = jnp.zeros(n, dt).at[E].set(rho_ph * w**2)

        def outer(carry, _):
            x, zc, y, xt, u, z = carry
            q = cbar[None] + jnp.zeros((S, n), dt).at[:, E].add(
                w[None] * (u - rho_ph * z[None]))

            def inner(c2, _):
                x, zc, y, xt = c2
                right = sigma * x - q + p.apply_AT(rho * zc - y)

                def KtK(V):
                    return p.apply_AT(rho * p.apply_A(V)) + (sigma + Pvec) * V

                xt = cg_unrolled(KtK, right, x0=xt, rtol=1e-12,
                                 max_iters=unroll_pcg_iters)
                zt = p.apply_A(xt)
                x = alpha * xt + (1 - alpha) * x
                zt = alpha * zt + (1 - alpha) * zc
                zc = jnp.clip(zt + y / rho, p.lb, p.ub)
                y = y + rho * (zt - zc)
                return (x, zc, y, xt), None

            (x, zc, y, xt), _ = jax.lax.scan(inner, (x, zc, y, xt), None,
                                             length=inner_steps)
            xE = w[None] * x[:, E]
            z = jnp.mean(p.pn[:, None] * xE, axis=0)
            u = u + rho_ph * (xE - z[None])
            return (x, zc, y, xt, u, z), None

        init = (jnp.zeros((S, n), dt), jnp.zeros((S, m), dt),
                jnp.zeros((S, m), dt), jnp.zeros((S, n), dt),
                jnp.zeros((S, E.shape[0]), dt), jnp.zeros(E.shape[0], dt))
        (x, zc, y, xt, u, z), _ = jax.lax.scan(outer, init, None,
                                               length=outer_iters)
        xE = w[None] * x[:, E]
        r_na = jnp.max(jnp.abs(xE - z[None]))
        Ax = p.apply_A(x)
        r_p = jnp.max(jnp.abs(Ax - jnp.clip(Ax, p.lb, p.ub)))
        obj = p.c @ (p.pn[:, None] * p.d[None] * x).mean(0)
        return r_na, r_p, obj

    def pretrain(self, p: ScenarioLP, steps: int = 10, lr: float = 2e-2,
                 outer_iters: int = 5, inner_steps: int = 3,
                 unroll_pcg_iters: int = 15):
        """Optimize (rho, sigma, alpha, rho_ph) by Adam on the truncated
        consensus convergence loss log(r_na) + log(r_p). Positivity via
        log-space; alpha constrained to (0, 2) by a scaled sigmoid."""
        import optax

        dt = self.dtype
        p0 = self.init_params()
        logits = {
            "rho": jnp.log(p0["rho"]),
            "sigma": jnp.log(p0["sigma"]),
            "rho_ph": jnp.log(p0["rho_ph"]),
            "alpha": jnp.log(p0["alpha"] / (2.0 - p0["alpha"])),
        }

        def to_params(lg):
            return {"rho": jnp.exp(lg["rho"]), "sigma": jnp.exp(lg["sigma"]),
                    "rho_ph": jnp.exp(lg["rho_ph"]),
                    "alpha": 2.0 * jax.nn.sigmoid(lg["alpha"])}

        tx = optax.adam(lr)
        opt_state = tx.init(logits)

        @jax.jit
        def step(lg, opt_state):
            def loss(lg):
                r_na, r_p, _ = self.solve_truncated(
                    p, to_params(lg), outer_iters=outer_iters,
                    inner_steps=inner_steps,
                    unroll_pcg_iters=unroll_pcg_iters)
                return (jnp.log(jnp.maximum(r_na, 1e-12))
                        + jnp.log(jnp.maximum(r_p, 1e-12)))

            val, g = jax.value_and_grad(loss)(lg)
            updates, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(lg, updates), opt_state, val

        best, best_val = logits, np.inf
        for i in range(steps + 1):
            prev = logits
            logits, opt_state, val = step(logits, opt_state)
            # val is the loss AT ``prev`` (value_and_grad before update)
            if np.isfinite(float(val)) and float(val) < best_val:
                best, best_val = prev, float(val)
            if self.verbose:
                print(f"pretrain step {i} loss={float(val):.4f}")
        return {k: jnp.asarray(v, dt) for k, v in to_params(best).items()}

    def _build(self, p: ScenarioLP, params, pcg_iters: int, pcg_rtol: float):
        """Shared iteration machinery for ``solve`` (host-chunked) and
        ``solve_fused`` (single device program): returns ``chunk_body``.
        """
        dt = self.dtype
        # same dtype-aware floor as LPSolverADMM: an unreachable inner
        # tolerance just burns the PCG iteration cap in roundoff noise
        pcg_rtol = max(pcg_rtol, 50 * float(jnp.finfo(dt).eps))
        n = p.n
        E = jnp.asarray(p.shared_idx)
        w = p.w
        cbar = p.d * p.c
        c_true = p.c
        local_mask = jnp.ones(n, bool).at[E].set(False)

        rho, sigma, alpha = params["rho"], params["sigma"], params["alpha"]

        def inner_iter(lb_l, ub_l, Pvec, Minv_diag, carry, _):
            x, zc, y, xt, q = carry
            right = sigma * x - q + p.apply_AT(rho * zc - y)

            def KtK(V):
                return p.apply_AT(rho * p.apply_A(V)) + (sigma + Pvec) * V

            xt = batched_pcg(KtK, right, Minv=lambda r: r * Minv_diag,
                             x0=xt, rtol=pcg_rtol, max_iters=pcg_iters)
            zt = p.apply_A(xt)
            x = alpha * xt + (1 - alpha) * x
            zt = alpha * zt + (1 - alpha) * zc
            zc = jnp.clip(zt + y / rho, lb_l, ub_l)
            y = y + rho * (zt - zc)
            return (x, zc, y, xt, q), None

        def outer_iter(lb_l, ub_l, wmean, rho_ph, Pvec, Minv_diag, carry):
            x, zc, y, xt, u, z = carry
            q = cbar[None] + jnp.zeros((x.shape[0], n), dt).at[:, E].add(
                w[None] * (u - rho_ph * z[None]))
            (x, zc, y, xt, _), _ = jax.lax.scan(
                partial(inner_iter, lb_l, ub_l, Pvec, Minv_diag),
                (x, zc, y, xt, q), None, length=self.inner_steps)
            xE = w[None] * x[:, E]  # true units
            z = wmean(xE)
            u = u + rho_ph * (xE - z[None])
            return (x, zc, y, xt, u, z)

        def chunk_body(x, zc, y, xt, u, z, lb_l, ub_l, pn_l, rho_ph, steps,
                       gmean, gmax):
            # rho_ph and steps are runtime scalars so residual balancing
            # and last-chunk clamping (host- or device-side) never
            # retrace the chunk
            Pvec = jnp.zeros(n, dt).at[E].set(rho_ph * w**2)
            Minv_diag = 1.0 / (sigma + Pvec + rho * p.Acnorm**2)
            # probability-weighted mean: pn is normalized so the global
            # mean of pn is 1, hence (p)mean(pn*v) = sum_s p_s v_s
            wmean = lambda v: gmean(pn_l[:, None] * v)
            z_in = z
            step_fn = partial(outer_iter, lb_l, ub_l, wmean, rho_ph, Pvec,
                              Minv_diag)
            carry = jax.lax.fori_loop(
                0, steps, lambda i, c: step_fn(c), (x, zc, y, xt, u, z))
            x, zc, y, xt, u, z = carry
            xE = w[None] * x[:, E]
            r_na = gmax(jnp.max(jnp.abs(xE - z[None])))
            # consensus dual-residual proxy: mean per-iteration z movement
            dz = jnp.max(jnp.abs(z - z_in)) / jnp.asarray(steps, dt)
            x_true = p.d[None] * x
            obj_local = x_true[:, local_mask] @ c_true[local_mask]
            obj = c_true[E] @ z + wmean(obj_local[:, None])[0]
            # worst primal infeasibility of the scenario subproblems
            Ax = p.apply_A(x)
            r_p = gmax(jnp.max(jnp.abs(Ax - jnp.clip(Ax, lb_l, ub_l))))
            return carry, (r_na, obj, r_p, dz)

        return chunk_body

    def solve(self, p: ScenarioLP, params: Optional[dict] = None,
              mesh: Optional[Mesh] = None, axis: str = "scenario",
              max_outer: int = 400, eval_freq: int = 20, tol: float = 1e-3,
              pcg_iters: int = 200, pcg_rtol: float = 1e-9,
              adapt_rho_ph: bool = True):
        """Returns (z, x_s, history, results).

        z: consensus first-stage solution (true units, shape (k,));
        x_s: per-scenario full solutions (S, n); results: dict with the
        extensive-form objective and residuals at exit.
        """
        params = params if params is not None else self.init_params()
        dt = self.dtype
        S, n = p.S, p.n
        m = p.lb.shape[1]
        k_sh = p.shared_idx.shape[0]
        chunk_body = self._build(p, params, pcg_iters, pcg_rtol)

        history = defaultdict(list)

        if mesh is None:
            gmean = lambda v: jnp.mean(v, axis=0)
            gmax = lambda v: v

            @partial(jax.jit, static_argnames=("steps",))
            def run(carry, rho_ph, steps):
                return chunk_body(*carry, p.lb, p.ub, p.pn, rho_ph, steps,
                                  gmean, gmax)

            x = jnp.zeros((S, n), dt)
            zc = jnp.zeros((S, m), dt)
            y = jnp.zeros((S, m), dt)
            xt = jnp.zeros((S, n), dt)
            u = jnp.zeros((S, k_sh), dt)
            z = jnp.zeros(k_sh, dt)
            carry = (x, zc, y, xt, u, z)
        else:
            n_dev = mesh.devices.size
            assert S % n_dev == 0, (
                f"n_scenarios={S} must divide over the {n_dev}-device mesh")
            gmean = lambda v: jax.lax.pmean(jnp.mean(v, axis=0), axis)
            gmax = lambda v: jax.lax.pmax(v, axis)

            def sharded(x, zc, y, xt, u, z, lb_l, ub_l, pn_l, rho_ph, steps):
                return chunk_body(x, zc, y, xt, u, z, lb_l, ub_l, pn_l,
                                  rho_ph, steps, gmean, gmax)

            vary = P(axis)
            repl = P()

            def make_run(steps):
                f = shard_map(
                    partial(sharded, steps=steps), mesh=mesh,
                    in_specs=(vary,) * 5 + (repl, vary, vary, vary, repl),
                    out_specs=((vary,) * 5 + (repl,),
                               (repl, repl, repl, repl)))
                return jax.jit(f)

            _cache = {}

            def run(carry, rho_ph, steps):
                if steps not in _cache:
                    _cache[steps] = make_run(steps)
                return _cache[steps](*carry, lb_dev, ub_dev, pn_dev, rho_ph)

            shard = jax.sharding.NamedSharding(mesh, vary)
            repl_sh = jax.sharding.NamedSharding(mesh, repl)
            x = jax.device_put(jnp.zeros((S, n), dt), shard)
            zc = jax.device_put(jnp.zeros((S, m), dt), shard)
            y = jax.device_put(jnp.zeros((S, m), dt), shard)
            xt = jax.device_put(jnp.zeros((S, n), dt), shard)
            u = jax.device_put(jnp.zeros((S, k_sh), dt), shard)
            z = jax.device_put(jnp.zeros(k_sh, dt), repl_sh)
            # local copies: mutating p.lb/p.ub would commit the caller's
            # problem object to this mesh's sharding as a side effect
            lb_dev = jax.device_put(p.lb, shard)
            ub_dev = jax.device_put(p.ub, shard)
            pn_dev = jax.device_put(p.pn, shard)
            carry = (x, zc, y, xt, u, z)

        k = 0
        r_na = obj = r_p = None
        rho_ph = float(params["rho_ph"])
        rho_ph0 = rho_ph
        while k < max_outer:
            steps = min(eval_freq, max_outer - k)
            t0 = time.perf_counter()
            carry, (r_na, obj, r_p, dz) = run(carry, jnp.asarray(rho_ph, dt),
                                              steps)
            k += steps
            float(jnp.asarray(obj))  # force completion for honest timing
            history["t_chunk"].append(time.perf_counter() - t0)
            history["r_nonanticipativity"].append(float(r_na))
            history["objective"].append(float(obj))
            history["r_primal"].append(float(r_p))
            history["rho_ph"].append(rho_ph)
            if self.verbose:
                print(f"outer={k} obj={float(obj):.6e} "
                      f"r_na={float(r_na):.3e} r_p={float(r_p):.3e} "
                      f"rho_ph={rho_ph:.2e}")
            if float(r_na) < tol and float(r_p) < tol * 10:
                break
            if adapt_rho_ph:
                # residual balancing on the consensus split: primal =
                # scenario disagreement, dual proxy = rho_ph * z movement
                # per outer iteration (same x2 policy as the single-LP
                # solver's residual balance, reference solvers.py:203-220)
                s_norm = rho_ph * float(dz)
                if float(r_na) > 10 * s_norm:
                    rho_ph = min(rho_ph * 2, rho_ph0 * 1e6)
                elif s_norm > 10 * float(r_na):
                    rho_ph = max(rho_ph / 2, rho_ph0 * 1e-4)

        x, zc, y, xt, u, z = carry
        x_true = np.asarray(p.d)[None] * _fetch_global(x)
        results = {"objective": float(obj), "r_nonanticipativity": float(r_na),
                   "r_primal": float(r_p), "outer_iters": k,
                   "rho_ph_final": rho_ph}
        return _fetch_global(z), x_true, history, results

    def solve_fused(self, p: ScenarioLP, params: Optional[dict] = None,
                    mesh: Optional[Mesh] = None, axis: str = "scenario",
                    max_outer: int = 400, eval_freq: int = 20,
                    tol: float = 1e-3, pcg_iters: int = 200,
                    pcg_rtol: float = 1e-9, adapt_rho_ph: bool = True):
        """Whole consensus solve as ONE device program (counterpart of
        ``LPSolverADMM.solve_fused``): ``lax.while_loop`` over jitted
        chunks with on-device convergence tests and rho_ph residual
        balancing. With a mesh, the loop — including the per-iteration
        consensus ``pmean`` — runs inside one ``shard_map`` program (the
        loop condition operands come from ``pmax``, so control flow is
        uniform across devices). Returns (z, x_s, results)."""
        params = params if params is not None else self.init_params()
        dt = self.dtype
        S, n = p.S, p.n
        m = p.lb.shape[1]
        k_sh = p.shared_idx.shape[0]
        chunk_body = self._build(p, params, pcg_iters, pcg_rtol)
        rho_ph0 = params["rho_ph"]

        def fused(x, zc, y, xt, u, z, lb_l, ub_l, pn_l, rho_ph0, gmean, gmax):
            res0 = jnp.full(4, jnp.inf, dt)

            def cond(st):
                k, carry, rho_ph, done, res = st
                return (k < max_outer) & (~done)

            def body(st):
                k, carry, rho_ph, done, res = st
                # clamp the last chunk so max_outer is never overrun when
                # eval_freq does not divide it (same policy as
                # LPSolverADMM.solve_fused; chunk_body takes steps as a
                # runtime fori_loop bound)
                steps = jnp.minimum(eval_freq, max_outer - k)
                carry, (r_na, obj, r_p, dz) = chunk_body(
                    *carry, lb_l, ub_l, pn_l, rho_ph, steps, gmean, gmax)
                k = k + steps
                done = (r_na < tol) & (r_p < tol * 10)
                if adapt_rho_ph:
                    s_norm = rho_ph * dz
                    up = r_na > 10 * s_norm
                    dn = s_norm > 10 * r_na
                    rho_ph = jnp.where(
                        (~done) & up,
                        jnp.minimum(rho_ph * 2, rho_ph0 * 1e6),
                        jnp.where((~done) & dn,
                                  jnp.maximum(rho_ph / 2, rho_ph0 * 1e-4),
                                  rho_ph))
                res = jnp.stack([r_na, obj, r_p, rho_ph])
                return (k, carry, rho_ph, done, res)

            st = (jnp.asarray(0, jnp.int32), (x, zc, y, xt, u, z),
                  jnp.asarray(rho_ph0, dt), jnp.asarray(False), res0)
            k, carry, rho_ph, done, res = jax.lax.while_loop(cond, body, st)
            return k, carry, res

        x = jnp.zeros((S, n), dt)
        zc = jnp.zeros((S, m), dt)
        y = jnp.zeros((S, m), dt)
        xt = jnp.zeros((S, n), dt)
        u = jnp.zeros((S, k_sh), dt)
        z = jnp.zeros(k_sh, dt)

        # cache compiled programs: re-solves (updated rhs/params) must hit
        # the warm executable, not re-pay the relay compile
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        # params and the (floored) inner CG tolerance ride as closure
        # constants inside chunk_body, so their VALUES must key the cache
        pcg_rtol_floored = max(pcg_rtol, 50 * float(jnp.finfo(dt).eps))
        key = (id(p), None if mesh is None else id(mesh), axis, max_outer,
               eval_freq, tol, pcg_iters, pcg_rtol_floored, adapt_rho_ph,
               self.inner_steps,
               tuple(sorted((n_, float(v)) for n_, v in params.items())))
        if key not in cache:
            while len(cache) >= 4:
                cache.pop(next(iter(cache)))
            if mesh is None:
                gmean = lambda v: jnp.mean(v, axis=0)
                gmax = lambda v: v
                cache[key] = jax.jit(partial(fused, gmean=gmean, gmax=gmax))
            else:
                n_dev = mesh.devices.size
                assert S % n_dev == 0, (
                    f"n_scenarios={S} must divide over the {n_dev}-device "
                    f"mesh")
                gmean = lambda v: jax.lax.pmean(jnp.mean(v, axis=0), axis)
                gmax = lambda v: jax.lax.pmax(v, axis)
                vary = P(axis)
                repl = P()
                cache[key] = jax.jit(shard_map(
                    partial(fused, gmean=gmean, gmax=gmax), mesh=mesh,
                    in_specs=(vary,) * 5 + (repl, vary, vary, vary, repl),
                    out_specs=(repl, (vary,) * 5 + (repl,), repl)))
        k, carry, res = cache[key](x, zc, y, xt, u, z, p.lb, p.ub, p.pn,
                                   jnp.asarray(rho_ph0, dt))

        x, zc, y, xt, u, z = carry
        res = np.asarray(res)
        x_true = np.asarray(p.d)[None] * _fetch_global(x)
        results = {"objective": float(res[1]),
                   "r_nonanticipativity": float(res[0]),
                   "r_primal": float(res[2]), "outer_iters": int(k),
                   "rho_ph_final": float(res[3])}
        return _fetch_global(z), x_true, results


def solve_consensus_lp(c, A_ub, b_ub, A_eq, b_eq_s, shared_idx,
                       mesh: Optional[Mesh] = None, dtype=None,
                       pretrain_steps: int = 0, fused: bool = False,
                       probs=None, **kwargs):
    """One-call scenario-consensus solve (counterpart of ``solve_lp``).

    ``probs``: optional per-scenario probabilities (consensus and the
    reported objective are probability-weighted; None = equiprobable).
    ``pretrain_steps > 0`` first tunes (rho, sigma, alpha, rho_ph) by
    Adam on the truncated-run convergence loss (single-device,
    differentiable path), then runs the full — possibly mesh-sharded —
    solve with the learned hyperparameters. ``fused=True`` runs that
    solve as one device program (no residual history)."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    solver_kw = {k: kwargs.pop(k) for k in
                 ("rho", "sigma", "alpha", "rho_ph", "inner_steps", "verbose")
                 if k in kwargs}
    p = ScenarioLP(c, A_ub, b_ub, A_eq, b_eq_s, shared_idx, probs=probs,
                   dtype=dtype)
    solver = ConsensusLPSolver(dtype=dtype, **solver_kw)
    params = solver.pretrain(p, steps=pretrain_steps) if pretrain_steps \
        else None
    if fused:
        z, x_s, results = solver.solve_fused(p, params=params, mesh=mesh,
                                             **kwargs)
        return z, x_s, {}, results
    return solver.solve(p, params=params, mesh=mesh, **kwargs)
