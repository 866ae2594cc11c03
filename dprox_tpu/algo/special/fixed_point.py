"""Fixed-point engines: Anderson acceleration and Broyden, jit-native.

Counterpart of
/root/reference/dprox/algo/specialization/deq/utils/solvers.py:114-256.
Anderson keeps the reference's m=6 memory and regularized least-squares
mixing; the first m steps run unrolled (growing history is static
Python), then a lax.while_loop continues with a full window. Broyden uses
the same rank-one inverse-Jacobian updates in a fixed-size buffer.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


_HI = jax.lax.Precision.HIGHEST


def _einsum(*a):
    # All contractions over the flattened state vector run at HIGHEST
    # precision: the TPU default-bf16 dot_general corrupts Anderson's
    # Gram matrix / mixing weights and Broyden's rank-one updates, which
    # halted the DEQ's convergence along the transient and moved the
    # finite-budget equilibrium 1.6 dB between backends
    # (benchmarks/deq_divergence.py; same failure class as the PCG note
    # in CLAUDE.md). Cost is negligible next to f itself.
    return jnp.einsum(*a, precision=_HI)


def _flat(x):
    return x.reshape(x.shape[0], -1)


def anderson(f: Callable, x0: jnp.ndarray, m: int = 6, lam: float = 1e-4,
             threshold: int = 50, eps: float = 1e-3, beta: float = 1.0):
    """Anderson acceleration; returns the final iterate.

    f operates on arrays shaped like x0 ([B, ...]).
    """
    bsz = x0.shape[0]
    D = int(x0.size // bsz)
    orig_shape = x0.shape

    def ff(v):  # flat -> flat
        return _flat(f(v.reshape(orig_shape)))

    # buffers adopt the fixed-point map's output dtype (the CSMRI state
    # is complex even when x0 is real)
    x0f = _flat(x0)
    f0 = ff(x0f)
    dtype = jnp.result_type(x0.dtype, f0.dtype)
    x0 = x0.astype(dtype)
    X = jnp.zeros((bsz, m, D), dtype)
    F = jnp.zeros((bsz, m, D), dtype)
    X = X.at[:, 0].set(x0f.astype(dtype))
    F = F.at[:, 0].set(f0.astype(dtype))
    X = X.at[:, 1].set(F[:, 0])
    F = F.at[:, 1].set(ff(F[:, 0]).astype(dtype))

    y = jnp.zeros((bsz, m + 1, 1), dtype).at[:, 0].set(1.0)

    def mix(X, F, k, n):
        """One Anderson update with n active history entries (n static)."""
        G = F[:, :n] - X[:, :n]
        Hm = _einsum("bnd,bmd->bnm", G, jnp.conj(G)) + lam * jnp.eye(n, dtype=dtype)
        H = jnp.zeros((bsz, n + 1, n + 1), dtype)
        H = H.at[:, 0, 1:].set(1.0).at[:, 1:, 0].set(1.0)
        H = H.at[:, 1:, 1:].set(Hm)
        alpha = jnp.linalg.solve(H, y[:, : n + 1])[:, 1:, 0]  # [B, n]
        xk = beta * _einsum("bn,bnd->bd", alpha, F[:, :n]) + \
            (1 - beta) * _einsum("bn,bnd->bd", alpha, X[:, :n])
        fk = ff(xk).astype(dtype)
        X = X.at[:, k % m].set(xk)
        F = F.at[:, k % m].set(fk)
        res = jnp.linalg.norm(fk - xk) / (1e-5 + jnp.linalg.norm(fk))
        return X, F, res

    # phase 1: growing history (static n)
    res = jnp.asarray(jnp.inf, x0.dtype)
    k = 2
    while k < min(threshold, m):
        X, F, res = mix(X, F, k, k)
        k += 1

    if threshold <= m:
        return X[:, (k - 1) % m].reshape(orig_shape)

    # phase 2: full window under while_loop
    def cond(carry):
        X, F, kk, res = carry
        return jnp.logical_and(kk < threshold, res >= eps)

    def body(carry):
        X, F, kk, _ = carry
        G = F - X
        Hm = _einsum("bnd,bmd->bnm", G, jnp.conj(G)) + lam * jnp.eye(m, dtype=dtype)
        H = jnp.zeros((bsz, m + 1, m + 1), dtype)
        H = H.at[:, 0, 1:].set(1.0).at[:, 1:, 0].set(1.0)
        H = H.at[:, 1:, 1:].set(Hm)
        alpha = jnp.linalg.solve(H, y)[:, 1:, 0]
        xk = beta * _einsum("bn,bnd->bd", alpha, F) + \
            (1 - beta) * _einsum("bn,bnd->bd", alpha, X)
        fk = ff(xk).astype(dtype)
        idx = kk % m
        X2 = jax.lax.dynamic_update_index_in_dim(X, xk, idx, axis=1)
        F2 = jax.lax.dynamic_update_index_in_dim(F, fk, idx, axis=1)
        res = jnp.linalg.norm(fk - xk) / (1e-5 + jnp.linalg.norm(fk))
        return X2, F2, kk + 1, res

    X, F, k_fin, res = jax.lax.while_loop(cond, body, (X, F, jnp.int32(k), res))
    # best available estimate: latest written slot
    idx = (k_fin - 1) % m
    xk = jax.lax.dynamic_index_in_dim(X, idx, axis=1, keepdims=False)
    return xk.reshape(orig_shape)


def broyden(f: Callable, x0: jnp.ndarray, threshold: int = 40, eps: float = 1e-3):
    """Broyden's method with rank-one inverse-Jacobian updates
    (reference: solvers.py:114-190; line search omitted — the reference
    defaults ls=False on the DEQ path)."""
    bsz = x0.shape[0]
    D = int(x0.size // bsz)
    orig_shape = x0.shape

    def g(v):
        return _flat(f(v.reshape(orig_shape))) - v

    x = _flat(x0)
    gx = g(x)
    Us = jnp.zeros((bsz, D, threshold), x0.dtype)
    VTs = jnp.zeros((bsz, threshold, D), x0.dtype)

    def matvec(Us, VTs, v):
        # (-I + U V^T) v
        return -v + _einsum("bdk,bk->bd", Us, _einsum("bkd,bd->bk", VTs, v))

    def rmatvec(Us, VTs, v):
        return -v + _einsum("bkd,bk->bd", VTs, _einsum("bdk,bd->bk", Us, v))

    update = -matvec(Us, VTs, gx)

    def cond(carry):
        x, gx, Us, VTs, update, k = carry
        return jnp.logical_and(k < threshold,
                               jnp.linalg.norm(gx) / (1e-9 + jnp.linalg.norm(gx + x)) >= eps)

    def body(carry):
        x, gx, Us, VTs, update, k = carry
        x_new = x + update
        gx_new = g(x_new)
        dx = x_new - x
        dg = gx_new - gx
        vT = rmatvec(Us, VTs, dx)
        denom = _einsum("bd,bd->b", vT, dg)[:, None]
        u = (dx - matvec(Us, VTs, dg)) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        vT = jnp.nan_to_num(vT)
        u = jnp.nan_to_num(u)
        Us2 = jax.lax.dynamic_update_index_in_dim(Us, u, k, axis=2)
        VTs2 = jax.lax.dynamic_update_index_in_dim(VTs, vT, k, axis=1)
        update_new = -matvec(Us2, VTs2, gx_new)
        return x_new, gx_new, Us2, VTs2, update_new, k + 1

    x, gx, *_ = jax.lax.while_loop(cond, body, (x, gx, Us, VTs, update, jnp.int32(0)))
    return x.reshape(orig_shape)


FIXED_POINT_SOLVERS = {"anderson": anderson, "broyden": broyden}
