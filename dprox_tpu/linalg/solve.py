"""Differentiable linear solve with implicit (analytic) gradients.

Counterpart of /root/reference/dprox/linalg/custom.py. The reference
implements the implicit-function-theorem backward pass with a custom
torch.autograd.Function (custom.py:39-62): forward solves A x = b; backward
solves A^T g_x = grad for grad_b, then obtains parameter gradients from the
VJP of -A(x). Here the same math is a ``jax.custom_vjp``:

    fwd:  x* = solver(A(theta, .), b)
    bwd:  gb = solver(A(theta, .)^T, g)            (matrix-free transpose)
          gtheta = vjp_theta(-A(theta, x*))(gb)

so gradients are exact at the solution regardless of solver iteration
count — no differentiation through the CG loop.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .solvers import SOLVERS, cg_unrolled

Array = jnp.ndarray


@dataclasses.dataclass
class LinearSolveConfig:
    """(reference: custom.py:9-27)"""

    rtol: float = 1e-6
    max_iters: int = 100
    verbose: bool = False
    solver_type: str = "cg"
    solver_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    use_analytic_grad: bool = True
    symmetric: bool = True  # KtK systems are SPD; skips building a transpose


def _run_solver(spec, A: Callable, b: Array, x0=None, Minv=None) -> Array:
    solver_type, rtol, max_iters, kwargs = spec[:4]
    fn = SOLVERS[solver_type]
    kwargs = dict(kwargs)
    if x0 is not None:
        kwargs["x0"] = x0
    if Minv is not None:
        kwargs["Minv"] = Minv
    return fn(A, b, rtol=rtol, max_iters=max_iters, **kwargs)


def _make_minv(spec, theta):
    """Bind the static preconditioner builder (spec[5], a pure function
    of (theta, r)) to the CURRENT theta. Traced preconditioner data must
    ride in theta — a closure over forward-trace tracers inside the
    static spec would leak into the custom_vjp backward pass."""
    Minv_fn = spec[5] if len(spec) > 5 else None
    if Minv_fn is None:
        return None
    return lambda r: Minv_fn(theta, r)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _implicit_solve(spec, A_fn: Callable, theta, b: Array, x0) -> Array:
    return _run_solver(spec, lambda v: A_fn(theta, v), b, x0,
                       _make_minv(spec, theta))


def _implicit_solve_fwd(spec, A_fn, theta, b, x0):
    x = _implicit_solve(spec, A_fn, theta, b, x0)
    return x, (theta, x, x0)


def _implicit_solve_bwd(spec, A_fn, res, g):
    theta, x, x0 = res
    symmetric = spec[4]
    if symmetric:
        AT = lambda v: A_fn(theta, v)
    else:
        transpose = jax.linear_transpose(lambda v: A_fn(theta, v), g)
        AT = lambda v: transpose(v)[0]
    # same SPD preconditioner accelerates the transpose solve
    gb = _run_solver(spec[:4], AT, g, Minv=_make_minv(spec, theta))
    # dtheta: VJP of theta -> -A(theta, x*) applied to gb. Integer leaves
    # in theta (e.g. the solver step counter riding in params) get float0
    # cotangents, which support no arithmetic — pass them through as-is.
    _, vjp = jax.vjp(lambda t: A_fn(t, x), theta)
    (gtheta,) = vjp(gb)
    gtheta = jax.tree.map(
        lambda t: t if getattr(t, "dtype", None) == jax.dtypes.float0 else -t,
        gtheta)
    # the converged solution does not depend on the warm start: zero grad
    gx0 = jax.tree.map(jnp.zeros_like, x0)
    return gtheta, gb, gx0


_implicit_solve.defvjp(_implicit_solve_fwd, _implicit_solve_bwd)


def linear_solve(A_fn: Callable, b: Array, theta=None,
                 config: Optional[LinearSolveConfig] = None,
                 x0: Optional[Array] = None,
                 Minv_fn: Optional[Callable] = None) -> Array:
    """Solve A(theta) x = b, differentiable w.r.t. ``theta`` and ``b``.

    ``A_fn(theta, v)`` is the matrix-free matvec; ``theta`` is any pytree
    of parameters appearing inside A (rho, learned operator weights, ...).
    With ``use_analytic_grad`` the backward pass uses the implicit
    formula; otherwise a fixed-iteration unrolled CG is differentiated
    through directly (reference: custom.py:65-82). ``x0`` warm-starts the
    iteration (zero gradient — at the solver tolerance the solution is
    independent of the initialization).
    """
    config = config or LinearSolveConfig()
    if theta is None:
        theta = ()
    if config.use_analytic_grad:
        spec = (config.solver_type, config.rtol, config.max_iters,
                tuple(sorted(config.solver_kwargs.items())), config.symmetric,
                Minv_fn)
        return _implicit_solve(spec, A_fn, theta, b, x0)
    return cg_unrolled(lambda v: A_fn(theta, v), b, x0=x0, rtol=config.rtol,
                       max_iters=config.max_iters)


def pcg_solve(A_fn: Callable, b: Array, theta=None, Minv=None, x0=None,
              rtol: float = 1e-6, max_iters: int = 100) -> Array:
    """Convenience preconditioned solve (reference: custom.py:85-87)."""
    cfg = LinearSolveConfig(rtol=rtol, max_iters=max_iters, solver_type="pcg",
                            solver_kwargs={"Minv": Minv, "x0": x0} if Minv or x0 is not None else {})
    from .solvers import pcg as _pcg

    # preconditioner/warm-start closures are not hashable config — call direct
    return _pcg(lambda v: A_fn(theta, v), b, Minv=Minv, x0=x0, rtol=rtol,
                max_iters=max_iters)
