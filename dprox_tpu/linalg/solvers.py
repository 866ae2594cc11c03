"""Matrix-free iterative solvers: batched CG, CG2, PCG, PLSS, MINRES.

Counterpart of /root/reference/dprox/linalg/solve/{solver_cg,solver_plss,
solver_minres}.py, redesigned for XLA: every solver is a jit-compatible
``lax.while_loop`` with a static iteration cap and an all-batch relative
residual stop, operating on arbitrary pytree-shaped unknowns of shape
[B, ...] with per-batch inner products (the reference's ``bdot``,
solver_cg.py:7-22). Data-dependent while_loops compile fine on TPU; the
implicit-gradient wrapper in ``solve.py`` means we never need to
differentiate *through* these loops.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def bdot(x: Array, y: Array) -> Array:
    """Per-batch dot product: contract all dims except the leading one."""
    B = x.shape[0]
    return jnp.sum(x.reshape(B, -1) * y.reshape(B, -1), axis=1)


def _bexpand(s: Array, like: Array) -> Array:
    """[B] -> [B,1,...,1] broadcastable against ``like``."""
    return s.reshape((-1,) + (1,) * (like.ndim - 1))


def cg(A: Callable, b: Array, x0: Optional[Array] = None, rtol: float = 1e-6,
       max_iters: int = 100, verbose: bool = False) -> Array:
    """Batched conjugate gradient for SPD A (matrix-free).

    Stops when every batch satisfies ||r|| <= rtol * ||b||, or at
    ``max_iters``. (reference: solver_cg.py:56-136.)
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    p = r
    rs = bdot(r, r)
    bnorm = jnp.sqrt(bdot(b, b))
    tol = rtol * jnp.maximum(bnorm, 1e-32)

    def cond(carry):
        x, r, p, rs, k = carry
        return jnp.logical_and(k < max_iters, jnp.any(jnp.sqrt(rs) > tol))

    def body(carry):
        x, r, p, rs, k = carry
        Ap = A(p)
        pAp = bdot(p, Ap)
        alpha = rs / jnp.maximum(pAp, 1e-32)
        x = x + _bexpand(alpha, x) * p
        r = r - _bexpand(alpha, r) * Ap
        rs_new = bdot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-32)
        p = r + _bexpand(beta, p) * p
        return x, r, p, rs_new, k + 1

    x, r, p, rs, k = jax.lax.while_loop(cond, body, (x, r, p, rs, jnp.int32(0)))
    return x


def cg_unrolled(A: Callable, b: Array, x0: Optional[Array] = None,
                rtol: float = 1e-6, max_iters: int = 100) -> Array:
    """Fixed-iteration CG via lax.scan — reverse-differentiable.

    Used when ``use_analytic_grad=False`` (unrolled-autograd parity with
    the reference's non-analytic path, custom.py:74-80). Converged batches
    freeze via masking so extra iterations are no-ops.
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    p = r
    rs = bdot(r, r)
    bnorm = jnp.sqrt(bdot(b, b))
    tol = rtol * jnp.maximum(bnorm, 1e-32)

    def body(carry, _):
        x, r, p, rs = carry
        active = jnp.sqrt(rs) > tol
        Ap = A(p)
        pAp = bdot(p, Ap)
        # safe denominators: masked-out lanes must not see ~0 divisions,
        # or jnp.where leaks NaNs into the backward pass
        alpha = jnp.where(active, rs, 0.0) / jnp.where(active, pAp, 1.0)
        x = x + _bexpand(alpha, x) * p
        r = r - _bexpand(alpha, r) * Ap
        rs_new = jnp.where(active, bdot(r, r), rs)
        beta = jnp.where(active, rs_new, 0.0) / jnp.where(active, rs, 1.0)
        p = r + _bexpand(beta, p) * p
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rs), None, length=max_iters)
    return x


def cg2(A: Callable, b: Array, x0: Optional[Array] = None, rtol: float = 1e-6,
        max_iters: int = 100, verbose: bool = False) -> Array:
    """Plain (non-batched-stop) CG variant; global residual stopping."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    p = r
    rs = jnp.vdot(r.ravel(), r.ravel())
    bb = jnp.vdot(b.ravel(), b.ravel())
    tol2 = (rtol**2) * jnp.maximum(bb, 1e-32)

    def cond(carry):
        x, r, p, rs, k = carry
        return jnp.logical_and(k < max_iters, rs > tol2)

    def body(carry):
        x, r, p, rs, k = carry
        Ap = A(p)
        alpha = rs / jnp.maximum(jnp.vdot(p.ravel(), Ap.ravel()), 1e-32)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r.ravel(), r.ravel())
        p = r + (rs_new / jnp.maximum(rs, 1e-32)) * p
        return x, r, p, rs_new, k + 1

    x, *_ = jax.lax.while_loop(cond, body, (x, r, p, rs, jnp.int32(0)))
    return x


def pcg(A: Callable, b: Array, Minv: Optional[Callable] = None,
        x0: Optional[Array] = None, rtol: float = 1e-6, max_iters: int = 100,
        verbose: bool = False) -> Array:
    """Preconditioned CG with inf-norm relative stop.

    (reference: solver_cg.py:172-233 — used by the LP ADMM inner solve
    with a Jacobi preconditioner and warm starts.)
    """
    if Minv is None:
        Minv = lambda v: v
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    z = Minv(r)
    p = z
    rz = bdot(r, z)
    bmax = jnp.max(jnp.abs(b.reshape(b.shape[0], -1)), axis=1)
    tol = rtol * jnp.maximum(bmax, 1e-32)

    def cond(carry):
        x, r, p, z, rz, k = carry
        rmax = jnp.max(jnp.abs(r.reshape(r.shape[0], -1)), axis=1)
        return jnp.logical_and(k < max_iters, jnp.any(rmax > tol))

    def body(carry):
        x, r, p, z, rz, k = carry
        Ap = A(p)
        alpha = rz / jnp.maximum(bdot(p, Ap), 1e-32)
        x = x + _bexpand(alpha, x) * p
        r = r - _bexpand(alpha, r) * Ap
        z = Minv(r)
        rz_new = bdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-32)
        p = z + _bexpand(beta, p) * p
        return x, r, p, z, rz_new, k + 1

    x, *_ = jax.lax.while_loop(cond, body, (x, r, p, z, rz, jnp.int32(0)))
    return x


def plss(A: Callable, b: Array, AT: Optional[Callable] = None,
         x0: Optional[Array] = None, rtol: float = 1e-6, max_iters: int = 100,
         verbose: bool = False) -> Array:
    """Projected Linear Systems Solver (SIAM 22M1509783), batched.

    Handles general rectangular/square systems matrix-free; requires the
    adjoint ``AT`` (defaults to A for self-adjoint operators). Faithful
    batched rewrite of the reference iteration
    (/root/reference/dprox/linalg/solve/solver_plss.py:12-90), with the
    min-residual iterate tracked per batch element.
    """
    if AT is None:
        AT = A
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.sqrt(bdot(b, b))
    tol = rtol * jnp.maximum(bnorm, 1e-32)

    r = A(x) - b
    rnorm = jnp.sqrt(bdot(r, r))
    y = AT(r / jnp.maximum(_bexpand(rnorm, r), 1e-32))
    rho = rnorm
    deltai = 1.0 / jnp.maximum(bdot(y, y), 1e-32)
    p = -_bexpand(deltai * rho, y) * y
    x = x + p
    x_min, rnorm_min = x, rnorm

    def cond(carry):
        x, p, x_min, rnorm_min, k = carry
        r = A(x) - b
        rn = jnp.sqrt(bdot(r, r))
        return jnp.logical_and(k < max_iters, jnp.any(rn > tol))

    def body(carry):
        x, p, x_min, rnorm_min, k = carry
        r = A(x) - b
        rn = jnp.sqrt(bdot(r, r))
        better = rn <= rnorm_min
        x_min = jnp.where(_bexpand(better, x), x, x_min)
        rnorm_min = jnp.where(better, rn, rnorm_min)

        y = AT(r / jnp.maximum(_bexpand(rn, r), 1e-32))
        rho = rn
        p2 = bdot(p, p)
        nrp = jnp.sqrt(p2)
        py = bdot(p, y)
        yy = bdot(y, y)
        ny = jnp.sqrt(yy)
        denom = (nrp * ny - py) * (nrp * ny + py)
        denom = jnp.where(jnp.abs(denom) < 1e-32, 1e-32, denom)
        beta1 = (rho * py) / denom
        beta2 = -(rho * p2) / denom
        p = _bexpand(beta1, p) * p + _bexpand(beta2, y) * y
        x = x + p
        return x, p, x_min, rnorm_min, k + 1

    x, p, x_min, rnorm_min, _ = jax.lax.while_loop(
        cond, body, (x, p, x_min, rnorm_min, jnp.int32(1)))
    r = A(x) - b
    rn = jnp.sqrt(bdot(r, r))
    worse = rnorm_min < rn
    return jnp.where(_bexpand(worse, x), x_min, x)


def plssw(A: Callable, b: Array, Wh: Optional[Array] = None,
          AT: Optional[Callable] = None, x0: Optional[Array] = None,
          rtol: float = 1e-6, max_iters: int = 100, verbose: bool = False) -> Array:
    """Weighted PLSS for ill-conditioned systems (reference:
    solver_plss.py:92-189). ``Wh`` is the diagonal weight; identity
    weight reduces to plain plss."""
    if Wh is None:
        return plss(A, b, AT, x0, rtol, max_iters)
    if AT is None:
        AT = A
    Whi = jnp.where(jnp.isfinite(1.0 / Wh), 1.0 / Wh, 0.0)
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.sqrt(bdot(b, b))
    tol = rtol * jnp.maximum(bnorm, 1e-32)

    c = A(x) - b
    nc = jnp.sqrt(bdot(c, c))
    y = AT(c / jnp.maximum(_bexpand(nc, c), 1e-32))
    z = Whi * y
    rho = nc
    deltai = 1.0 / jnp.maximum(bdot(z, z), 1e-32)
    p = -_bexpand(deltai * rho, z) * (Whi * z)
    x = x + p
    x_min, nc_min = x, nc

    def cond(carry):
        x, p, x_min, nc_min, k = carry
        c = A(x) - b
        n = jnp.sqrt(bdot(c, c))
        return jnp.logical_and(k < max_iters, jnp.any(n > tol))

    def body(carry):
        x, p, x_min, nc_min, k = carry
        c = A(x) - b
        nc = jnp.sqrt(bdot(c, c))
        better = nc <= nc_min
        x_min = jnp.where(_bexpand(better, x), x, x_min)
        nc_min = jnp.where(better, nc, nc_min)

        y = AT(c / jnp.maximum(_bexpand(nc, c), 1e-32))
        z = Whi * y
        rho = nc
        Wp = Wh * p
        p2 = bdot(Wp, Wp)
        nrp = jnp.sqrt(p2)
        py = bdot(p, y)
        yy = bdot(z, z)
        ny = jnp.sqrt(yy)
        denom = (nrp * ny - py) * (nrp * ny + py)
        denom = jnp.where(jnp.abs(denom) < 1e-32, 1e-32, denom)
        beta1 = (rho * py) / denom
        beta2 = -(rho * p2) / denom
        p = _bexpand(beta1, p) * p + _bexpand(beta2, z) * (Whi * z)
        x = x + p
        return x, p, x_min, nc_min, k + 1

    x, p, x_min, nc_min, _ = jax.lax.while_loop(
        cond, body, (x, p, x_min, nc_min, jnp.int32(1)))
    c = A(x) - b
    n = jnp.sqrt(bdot(c, c))
    worse = nc_min < n
    return jnp.where(_bexpand(worse, x), x_min, x)


def minres(A: Callable, b: Array, x0: Optional[Array] = None, rtol: float = 1e-6,
           max_iters: int = 100, shift: float = 0.0, verbose: bool = False) -> Array:
    """Batched MINRES for symmetric (possibly indefinite) systems.

    Paige-Saunders Lanczos + Givens recurrence, batched over the leading
    axis with a while_loop capped at ``max_iters``. (reference:
    solver_minres.py:22-290, there vendored from linear_operator; this is
    an independent textbook derivation in JAX.)
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r1 = b - (A(x) - shift * x) if x0 is not None else b
    beta1 = jnp.sqrt(bdot(r1, r1))
    bnorm = jnp.sqrt(bdot(b, b))
    tol = rtol * jnp.maximum(bnorm, 1e-32)

    # Lanczos vectors v_k = r_k / beta_k; r2/r1 track the last two residuals
    state = dict(
        x=x,
        r1=jnp.zeros_like(b),  # r_{k-1}
        r2=r1,                 # r_k
        w0=jnp.zeros_like(b),  # w_{k-2}
        w1=jnp.zeros_like(b),  # w_{k-1}
        beta=beta1,
        beta_prev=jnp.zeros_like(beta1),
        eta=beta1,
        c_old=jnp.ones_like(beta1),
        c=jnp.ones_like(beta1),
        s_old=jnp.zeros_like(beta1),
        s=jnp.zeros_like(beta1),
        resid=beta1,
        k=jnp.int32(0),
    )
    keys = list(state.keys())

    def cond(carry):
        st = dict(zip(keys, carry))
        return jnp.logical_and(st["k"] < max_iters, jnp.any(st["resid"] > tol))

    def body(carry):
        st = dict(zip(keys, carry))
        v = st["r2"] / jnp.maximum(_bexpand(st["beta"], st["r2"]), 1e-32)
        Av = A(v) - shift * v
        alpha = bdot(v, Av)
        # three-term Lanczos recurrence
        r_next = Av - _bexpand(alpha / jnp.maximum(st["beta"], 1e-32), Av) * st["r2"]
        r_next = r_next - _bexpand(st["beta"] / jnp.maximum(st["beta_prev"], 1e-32)
                                   * (st["beta_prev"] > 0), r_next) * st["r1"]
        beta_next = jnp.sqrt(bdot(r_next, r_next))

        # previous rotations applied to the new column of T
        delta1 = st["c"] * alpha - st["c_old"] * st["s"] * st["beta"]
        gamma = jnp.sqrt(delta1**2 + beta_next**2)
        eps = st["s_old"] * st["beta"]
        delta2 = st["s"] * alpha + st["c_old"] * st["c"] * st["beta"]
        c_next = delta1 / jnp.maximum(gamma, 1e-32)
        s_next = beta_next / jnp.maximum(gamma, 1e-32)

        w = (v - _bexpand(eps, v) * st["w0"] - _bexpand(delta2, v) * st["w1"])
        w = w / jnp.maximum(_bexpand(gamma, w), 1e-32)
        x = st["x"] + _bexpand(c_next * st["eta"], w) * w
        eta_next = -s_next * st["eta"]

        new = dict(
            x=x, r1=st["r2"], r2=r_next, w0=st["w1"], w1=w,
            beta=beta_next, beta_prev=st["beta"], eta=eta_next,
            c_old=st["c"], c=c_next, s_old=st["s"], s=s_next,
            resid=jnp.abs(eta_next), k=st["k"] + 1,
        )
        return tuple(new[k2] for k2 in keys)

    carry = jax.lax.while_loop(cond, body, tuple(state[k2] for k2 in keys))
    return dict(zip(keys, carry))["x"]


def cg_pallas(A: Callable, b: Array, x0: Optional[Array] = None,
              rtol: float = 1e-6, max_iters: int = 100,
              verbose: bool = False) -> Array:
    """Batched CG whose per-iteration tail (both reductions + all three
    axpys) runs as ONE fused Pallas VMEM pass (ops/pallas_kernels.py::
    fused_cg_tail); only the matvec A(p) stays an XLA program. Same math
    and stopping rule as :func:`cg` — A/B'd against it on the real TPU in
    benchmarks/cg_pallas_ab.py (BASELINE.json north-star clause)."""
    from ..ops.pallas_kernels import fused_cg_tail

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    p = r
    rs = bdot(r, r)
    bnorm = jnp.sqrt(bdot(b, b))
    tol = rtol * jnp.maximum(bnorm, 1e-32)

    def cond(carry):
        x, r, p, rs, k = carry
        return jnp.logical_and(k < max_iters, jnp.any(jnp.sqrt(rs) > tol))

    def body(carry):
        x, r, p, rs, k = carry
        x, r, p, rs = fused_cg_tail(x, r, p, A(p), rs)
        return x, r, p, rs, k + 1

    x, r, p, rs, k = jax.lax.while_loop(cond, body,
                                        (x, r, p, rs, jnp.int32(0)))
    return x


SOLVERS = {
    "cg": cg,
    "cg2": cg2,
    "cg_pallas": cg_pallas,
    "pcg": pcg,
    "plss": plss,
    "plssw": plssw,
    "minres": minres,
}
