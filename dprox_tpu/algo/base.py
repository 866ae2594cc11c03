"""Algorithm base: compiles proxfn lists into jitted lax.scan iteration loops.

Counterpart of /root/reference/dprox/algo/base.py, inverted for JAX: the
reference's Algorithm is an nn.Module whose Python ``iters`` loop mutates
Variable values and per-op ``step`` attributes each iteration
(base.py:128-178); here a solver compiles to a *pure* function

    state_{k+1} = _iter(state_k, rho_k, lam_k, step_k, params, offsets)

scanned over per-iteration (rho, lam) schedules under jit. Placeholder
data and learned operator parameters arrive via ``params``; per-psi-fn
offsets are hoisted out of the loop (they are iteration-invariant).

State is a tuple pytree; ``pack``/``unpack`` flatten it along the channel
axis for the RL tuner (reference: base.py:224-275).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from typing import NamedTuple, Any

from ..linop.base import Params
from ..proxfn.base import ProxFn
from ..utils.misc import to_jax_array

Array = jnp.ndarray


class IterAux(NamedTuple):
    """Iteration-invariant values hoisted out of the solver loop:
    per-psi-fn offsets and the least-squares ``prepare`` pytree."""

    offsets: Any
    lsq: Any = None


_COMPLEX_TAG = "__complex_pair__"


def encode_complex(tree):
    """Replace complex leaves by {re, im} f32 pairs.

    Complex arrays cannot cross the host<->device boundary on the axon
    TPU backend (transfers are UNIMPLEMENTED); splitting at the jit
    boundary and recombining inside the executable sidesteps this with
    zero in-graph cost (lax.complex fuses)."""

    def enc(x):
        if hasattr(x, "dtype") and np.issubdtype(np.asarray(x).dtype if isinstance(x, np.ndarray) else x.dtype, np.complexfloating):
            xr = np.asarray(x) if isinstance(x, np.ndarray) else x
            if isinstance(xr, np.ndarray):
                return {_COMPLEX_TAG + "re": np.real(xr).astype(np.float32),
                        _COMPLEX_TAG + "im": np.imag(xr).astype(np.float32)}
            return {_COMPLEX_TAG + "re": jnp.real(xr), _COMPLEX_TAG + "im": jnp.imag(xr)}
        return x

    return jax.tree.map(enc, tree)


def decode_complex(tree):
    """Inverse of encode_complex, used inside jit. Pairs are detected by
    key structure (values may be tracers — never branch on them)."""

    def is_pair(x):
        return isinstance(x, dict) and (_COMPLEX_TAG + "re") in x

    def dec(x):
        if is_pair(x):
            return jax.lax.complex(jnp.asarray(x[_COMPLEX_TAG + "re"]),
                                   jnp.asarray(x[_COMPLEX_TAG + "im"]))
        return x

    return jax.tree.map(dec, tree, is_leaf=is_pair)


def _isscalar(x):
    return np.isscalar(x) or (hasattr(x, "ndim") and getattr(x, "ndim", None) == 0)


def _schedule(val, max_iter: int) -> Array:
    """Normalize a scalar/sequence to a [max_iter] (or [max_iter, B]) array
    with the iteration axis leading (scan axis)."""
    if _isscalar(val):
        return jnp.full((max_iter,), float(val), jnp.float32)
    arr = jnp.asarray(val, jnp.float32)
    if arr.ndim == 1:
        assert arr.shape[0] == max_iter, f"schedule length {arr.shape[0]} != max_iter {max_iter}"
        return arr
    # [B, max_iter] -> [max_iter, B] (reference indexes rhos[..., iter])
    if arr.shape[-1] == max_iter:
        return jnp.moveaxis(arr, -1, 0)
    return arr


class Algorithm:
    """Base proximal algorithm (compile-time object, runtime-pure)."""

    @classmethod
    def partition(cls, prox_fns: List[ProxFn]):
        raise NotImplementedError

    @classmethod
    def create(cls, prox_fns: List[ProxFn], *args, **kwargs):
        psi, omega = cls.partition(prox_fns)
        return cls(psi, omega, *args, **kwargs)

    def __init__(self, psi_fns: List[ProxFn], omega_fns: List[ProxFn]):
        self.psi_fns = list(psi_fns)
        self.omega_fns = list(omega_fns)
        self._jit_cache: Dict = {}

    # ------------------------------------------------------------------ #
    # To be implemented by concrete algorithms
    # ------------------------------------------------------------------ #

    def initialize(self, x0: Array, params: Optional[Params]):
        raise NotImplementedError

    def _iter(self, state, rho, lam: Sequence[Array], step, params, offsets):
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    # Shared machinery
    # ------------------------------------------------------------------ #

    def K_forward(self, x: Array, params: Optional[Params]):
        """Linear images [K_i x] for each psi fn (the reference's
        ``K.forward(x, return_list=True)``)."""
        return [fn.dag_forward(x, params) for fn in self.psi_fns]

    def psi_offsets(self, x0: Array, params: Optional[Params]):
        """Per-psi-fn constant offsets, hoisted out of the iteration loop."""
        var_shapes = self._var_shapes(x0)
        return [fn.offset(var_shapes, params) for fn in self.psi_fns]

    def prepare_aux(self, x0: Array, params: Optional[Params]) -> IterAux:
        """Compute everything iteration-invariant once per solve."""
        offsets = tuple(self.psi_offsets(x0, params))
        lsq = None
        ls = getattr(self, "least_square", None)
        if ls is not None and hasattr(ls, "prepare"):
            lsq = ls.prepare(self._var_shapes(x0), params,
                             ref_shape=tuple(x0.shape))
        return IterAux(offsets=offsets, lsq=lsq)

    def _var_shapes(self, x0: Array):
        names = set()
        for fn in self.psi_fns + self.omega_fns:
            for v in fn.linop.variables:
                names.add(v.name)
        if not names:
            names = {"x"}
        return {n: x0.shape for n in names}

    def defaults(self, rhos, lams, max_iter: int):
        """rho=1.0, lam=0.02 broadcast to schedules
        (reference: base.py:205-218)."""
        if rhos is None:
            rhos = 1.0
        if lams is None:
            lams = 0.02
        rhos = _schedule(rhos, max_iter)
        if isinstance(lams, dict):
            lam_list = []
            for fn in self.psi_fns:
                val = lams.get(fn, 0.02)
                lam_list.append(_schedule(val, max_iter))
        elif isinstance(lams, (list, tuple)) and len(lams) == len(self.psi_fns) and not _isscalar(lams[0]):
            lam_list = [_schedule(v, max_iter) for v in lams]
        else:
            lam_list = [_schedule(lams, max_iter) for _ in self.psi_fns]
        return rhos, tuple(lam_list)

    # ------------------------------------------------------------------ #
    # Solve
    # ------------------------------------------------------------------ #

    def solve(self, x0=None, rhos=None, lams=None, max_iter: int = 24,
              params: Optional[Params] = None, pbar: bool = False,
              callback: Optional[Callable] = None,
              return_full_states: bool = False, jit: bool = True,
              real_output: bool = False, **kwargs):
        """Run the solver; returns x* (or the full state trajectory).

        (reference: base.py:85-126 — here the loop is a jitted lax.scan
        unless a Python ``callback`` is requested.)
        """
        # remember the caller's rank: non-batched inputs (flat vectors,
        # bare matrices — reference tests/problem/test_ml_problems.py:5-44)
        # get a leading batch dim prepended internally and must come back
        # in their original shape, like the reference's x.value does
        orig_shape = tuple(x0.shape) if hasattr(x0, "shape") else None
        x0 = self._prepare_x0(x0)
        rhos, lam_list = self.defaults(rhos, lams, max_iter)
        params = dict(params) if params else {}

        def _debatch(out):
            return self._restore_shape(out, orig_shape)

        if callback is not None or not jit:
            x0 = decode_complex(encode_complex(x0))
            params = decode_complex(encode_complex(params))
            state = self.initialize(x0, params)
            offsets = self.prepare_aux(x0, params)
            for it in range(max_iter):
                rho = rhos[it]
                lam = [l[it] for l in lam_list]
                p_it = dict(params, __step__=it)
                state = self._iter(state, rho, lam, it, p_it, offsets)
                if callback is not None:
                    callback(iter=it, state=state, rho=rho, lam=lam)
            if return_full_states:
                return state
            out = _debatch(state[0])
            return jnp.real(out) if real_output else out

        run = self._get_jitted(return_full_states, real_output)
        state = run(encode_complex(x0), rhos, lam_list, encode_complex(params))
        return state if return_full_states else _debatch(state[0])

    @staticmethod
    def _restore_shape(out, orig_shape):
        """Undo `_prepare_x0`'s batching so the solution comes back in
        the caller's layout (reference: x.value keeps the user's shape).
        Handles both the rank-prepend (CHW/2-D/1-D -> B...) and the
        HWC -> BCHW transpose of `to_jax_array(batch=True)`."""
        if orig_shape is None:
            return out
        if tuple(out.shape) == (1,) + orig_shape:
            return out[0]
        if (len(orig_shape) == 3 and orig_shape[2] in (1, 3)
                and tuple(out.shape) == (1, orig_shape[2],
                                         orig_shape[0], orig_shape[1])):
            return jnp.transpose(out[0], (1, 2, 0))
        return out

    @staticmethod
    def _prepare_x0(x0):
        # complex inputs stay host-side numpy until the jit boundary:
        # complex host<->device transfers are unimplemented on axon
        if isinstance(x0, np.ndarray) and np.iscomplexobj(x0):
            if x0.ndim == 3 and x0.shape[2] in (1, 3):
                x0 = x0.transpose(2, 0, 1)
            while x0.ndim < 4:
                x0 = x0[None]
            return x0.astype(np.complex64)
        x0 = to_jax_array(x0, batch=True)
        return x0.astype(jnp.complex64 if jnp.iscomplexobj(x0) else jnp.float32)

    def residuals(self, prev_state, state, rho, params):
        """Relative primal/dual residual norms for one iteration, or None
        if the algorithm has no consensus splitting (overridden by the
        ADMM family)."""
        return None

    def solve_with_residuals(self, x0=None, rhos=None, lams=None,
                             max_iter: int = 24,
                             params: Optional[Params] = None,
                             real_output: bool = True):
        """Jitted solve that also records relative primal/dual residual
        norms per iteration — the convergence observability the
        reference only provides on its LP path (lp/solvers.py:324-336).
        Returns ``(x, {'r_primal': [T], 'r_dual': [T]})``."""
        orig_shape = tuple(x0.shape) if hasattr(x0, "shape") else None
        x0 = self._prepare_x0(x0)
        rhos, lam_list = self.defaults(rhos, lams, max_iter)
        params = dict(params) if params else {}
        key = ("residuals", real_output)
        if key not in self._jit_cache:

            def _run(x0, rhos, lam_list, params):
                x0 = decode_complex(x0)
                params = decode_complex(params)
                state = self.initialize(x0, params)
                offsets = self.prepare_aux(x0, params)
                probe = self.residuals(state, state, rhos[0],
                                       dict(params, __step__=0))
                if probe is None:
                    raise NotImplementedError(
                        f"{type(self).__name__} does not track primal/dual "
                        "residuals (no consensus splitting); use "
                        "solve(callback=...) for custom convergence metrics")

                def body(st, xs):
                    step, rho, lam = xs
                    p_it = dict(params, __step__=step)
                    new = self._iter(st, rho, list(lam), step, p_it, offsets)
                    return new, self.residuals(st, new, rho, p_it)

                xs = (jnp.arange(rhos.shape[0]), rhos, lam_list)
                state, res = jax.lax.scan(body, state, xs)
                out = jnp.real(state[0]) if real_output else state[0]
                return out, res

            self._jit_cache[key] = jax.jit(_run)
        out, res = self._jit_cache[key](encode_complex(x0), rhos, lam_list,
                                        encode_complex(params))
        return self._restore_shape(out, orig_shape), res

    def solve_until(self, x0=None, rhos=None, lams=None,
                    max_iter: int = 100, tol: float = 1e-4,
                    params: Optional[Params] = None,
                    real_output: bool = True):
        """Solve until BOTH relative primal/dual residuals fall below
        ``tol`` (or ``max_iter``), inside a single jitted
        ``lax.while_loop`` — device-side early stopping, no host
        round-trips. Requires an algorithm with residual tracking (the
        ADMM family). Returns ``(x, iterations_used)``.

        The reference's imaging solvers always run the full schedule;
        only its LP path stops on residuals (lp/solvers.py:208-210).
        """
        orig_shape = tuple(x0.shape) if hasattr(x0, "shape") else None
        x0 = self._prepare_x0(x0)
        rhos, lam_list = self.defaults(rhos, lams, max_iter)
        params = dict(params) if params else {}
        key = ("until", real_output)
        if key not in self._jit_cache:

            def _run(x0, rhos, lam_list, params, tol):
                x0 = decode_complex(x0)
                params = decode_complex(params)
                state0 = self.initialize(x0, params)
                offsets = self.prepare_aux(x0, params)
                probe = self.residuals(state0, state0, rhos[0],
                                       dict(params, __step__=0))
                if probe is None:
                    raise NotImplementedError(
                        f"{type(self).__name__} does not track primal/dual "
                        "residuals; solve_until needs the ADMM family")
                n = rhos.shape[0]

                def cond(carry):
                    _, k, rp, rd = carry
                    return jnp.logical_and(
                        k < n, jnp.logical_or(rp > tol, rd > tol))

                def body(carry):
                    st, k, _, _ = carry
                    rho = rhos[k]
                    lam = [l[k] for l in lam_list]
                    p_it = dict(params, __step__=k)
                    new = self._iter(st, rho, lam, k, p_it, offsets)
                    res = self.residuals(st, new, rho, p_it)
                    return (new, k + 1, res["r_primal"], res["r_dual"])

                init = (state0, jnp.int32(0), jnp.float32(jnp.inf),
                        jnp.float32(jnp.inf))
                state, k, _, _ = jax.lax.while_loop(cond, body, init)
                out = jnp.real(state[0]) if real_output else state[0]
                return out, k

            self._jit_cache[key] = jax.jit(_run)
        out, k = self._jit_cache[key](encode_complex(x0), rhos, lam_list,
                                      encode_complex(params),
                                      jnp.float32(tol))
        return self._restore_shape(out, orig_shape), k

    def iters(self, state, rhos, lam_list, max_iter: int,
              params: Optional[Params] = None, offsets=None, x_ref=None):
        """Advance ``state`` by max_iter iterations (used by the RL tuner's
        action_pack inner loop; reference: base.py:128-156)."""
        params = params or {}
        if offsets is None:
            offsets = self.prepare_aux(x_ref if x_ref is not None else state[0], params)
        rhos, lam_tuple = self.defaults(rhos, lam_list, max_iter)

        def body(st, xs):
            step, rho, lam = xs
            p_it = dict(params, __step__=step)
            return self._iter(st, rho, list(lam), step, p_it, offsets), None

        xs = (jnp.arange(max_iter), rhos, lam_tuple)
        state, _ = jax.lax.scan(body, state, xs)
        return state

    def _has_stateful(self):
        return any(getattr(fn, "stateful", False)
                   for fn in self.psi_fns + self.omega_fns)

    def _get_jitted(self, return_full: bool, real_output: bool = False):
        key = ("run", return_full, real_output)
        if key not in self._jit_cache:
            unrolled = self._has_stateful()

            def _run(x0, rhos, lam_list, params):
                x0 = decode_complex(x0)
                params = decode_complex(params)
                state = self.initialize(x0, params)
                offsets = self.prepare_aux(x0, params)

                if unrolled:
                    # stateful proxfns (DGUNet-style carry) need concrete
                    # step indices: unroll at trace time
                    traj = []
                    for it in range(rhos.shape[0]):
                        lam = [l[it] for l in lam_list]
                        state = self._iter(state, rhos[it], lam, it,
                                           dict(params, __step__=it), offsets)
                        if return_full:
                            traj.append(state)
                    if return_full:
                        return jax.tree.map(lambda *xs: jnp.stack(xs), *traj)
                    if real_output:
                        # extract the real part inside this executable:
                        # complex buffers cannot cross executables on the
                        # axon backend
                        return (jnp.real(state[0]),) + tuple(state[1:])
                    return state

                def body(st, xs):
                    step, rho, lam = xs
                    p_it = dict(params, __step__=step)
                    new = self._iter(st, rho, list(lam), step, p_it, offsets)
                    return new, (new if return_full else None)

                xs = (jnp.arange(rhos.shape[0]), rhos, lam_list)
                state, traj = jax.lax.scan(body, state, xs)
                if return_full:
                    return traj
                if real_output:
                    return (jnp.real(state[0]),) + tuple(state[1:])
                return state

            self._jit_cache[key] = jax.jit(_run)
        return self._jit_cache[key]

    # ------------------------------------------------------------------ #
    # RL/state helpers (reference: base.py:224-275)
    # ------------------------------------------------------------------ #

    def pack(self, state) -> Array:
        flat = []
        for s in state:
            if isinstance(s, (list, tuple)):
                flat.extend(s)
            else:
                flat.append(s)
        return jnp.concatenate(flat, axis=1)

    def unpack(self, tensor: Array):
        n = self.state_dim
        parts = jnp.split(tensor, n, axis=1)
        out, idx = [], 0
        for d in self.state_split:
            if d == 1:
                out.append(parts[idx])
                idx += 1
            else:
                k = d[0]
                out.append(list(parts[idx:idx + k]))
                idx += k
        return out

    @property
    def state_dim(self) -> int:
        ans = 0
        for s in self.state_split:
            ans += s if isinstance(s, int) else sum(s)
        return ans

    @property
    def state_split(self):
        raise NotImplementedError

    @property
    def nparams(self):
        raise NotImplementedError
