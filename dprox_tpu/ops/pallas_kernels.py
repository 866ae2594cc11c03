"""Pallas TPU kernels for the solver's hot elementwise steps.

The FFT x-update dominates the freq-diagonal path (measured ~370us for a
512^2x3 complex FFT pair on v5e — the solver loop runs at ~80% of that
speed of light). What remains is the chain of elementwise ops around it:
consensus updates, soft-thresholds, frequency-domain diagonal divides.
XLA fuses most of these; the kernels here fuse *across* op boundaries it
does not (prox + dual update share loads of Kx/u/v), executed in one
VMEM pass each. Every kernel has a jnp reference implementation used as
fallback off-TPU and as the correctness oracle in tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas imports fail gracefully on unsupported backends
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _on_tpu():
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# --------------------------------------------------------------------------- #
# Fused ADMM consensus update: v = prox(Kx + u), u = u + Kx - v
# for the two separable proxes that dominate the zoo (nonneg, soft-threshold)
# --------------------------------------------------------------------------- #

def _admm_update_ref(Kx, u, lam, kind: str):
    w = Kx + u
    if kind == "nonneg":
        v = jnp.maximum(w, 0.0)
    elif kind == "soft":
        v = jnp.sign(w) * jnp.maximum(jnp.abs(w) - lam, 0.0)
    else:
        raise ValueError(kind)
    return v, u + Kx - v


def _admm_update_kernel(kind, Kx_ref, u_ref, lam_ref, v_ref, unew_ref):
    Kx = Kx_ref[:]
    u = u_ref[:]
    w = Kx + u
    if kind == "nonneg":
        v = jnp.maximum(w, 0.0)
    else:
        lam = lam_ref[0, 0]
        v = jnp.sign(w) * jnp.maximum(jnp.abs(w) - lam, 0.0)
    v_ref[:] = v
    unew_ref[:] = u + Kx - v


def fused_admm_update(Kx, u, lam, kind: str = "nonneg", force: bool = False):
    """One-pass v/u ADMM update. Falls back to jnp off-TPU."""
    if not (_HAS_PALLAS and (_on_tpu() or force)):
        return _admm_update_ref(Kx, u, lam, kind)
    shape = Kx.shape
    flat = (int(jnp.size(Kx)) // shape[-1], shape[-1])
    Kx2 = Kx.reshape(flat)
    u2 = u.reshape(flat)
    lam_arr = jnp.asarray(lam, Kx.dtype).reshape(-1)[0].reshape(1, 1)
    v, unew = pl.pallas_call(
        partial(_admm_update_kernel, kind),
        out_shape=(jax.ShapeDtypeStruct(flat, Kx.dtype),
                   jax.ShapeDtypeStruct(flat, Kx.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(Kx2, u2, lam_arr)
    return v.reshape(shape), unew.reshape(shape)


# --------------------------------------------------------------------------- #
# Frequency-diagonal divide: out = (F + eps) / (diag + rho + eps)
# on interleaved (re, im) planes — complex arrays enter as two f32 planes
# --------------------------------------------------------------------------- #

def _freq_divide_ref(F, diag, rho, eps=1e-7):
    return (F + eps) / (diag + rho + eps)


def _freq_divide_kernel(Fre_ref, Fim_ref, d_ref, scal_ref, ore_ref, oim_ref):
    rho = scal_ref[0, 0]
    eps = scal_ref[0, 1]
    denom = d_ref[:] + rho + eps
    inv = 1.0 / denom
    ore_ref[:] = (Fre_ref[:] + eps) * inv
    oim_ref[:] = Fim_ref[:] * inv


def freq_divide(F, diag, rho, eps: float = 1e-7, force: bool = False):
    """(F+eps)/(diag+rho+eps) with real diag — the freq x-update divide.

    Splitting the complex array into planes keeps the VPU in f32 and
    shares the single reciprocal across both planes.
    """
    if not (_HAS_PALLAS and (_on_tpu() or force)):
        return _freq_divide_ref(F, diag + 0.0, rho, eps)
    shape = F.shape
    flat = (int(jnp.size(F)) // shape[-1], shape[-1])
    Fre = jnp.real(F).reshape(flat)
    Fim = jnp.imag(F).reshape(flat)
    d = jnp.broadcast_to(jnp.asarray(diag, Fre.dtype), shape).reshape(flat)
    scal = jnp.stack([jnp.asarray(rho, Fre.dtype).reshape(()),
                      jnp.asarray(eps, Fre.dtype)]).reshape(1, 2)
    ore, oim = pl.pallas_call(
        _freq_divide_kernel,
        out_shape=(jax.ShapeDtypeStruct(flat, Fre.dtype),
                   jax.ShapeDtypeStruct(flat, Fre.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 2), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(Fre, Fim, d, scal)
    return (ore + 1j * oim).reshape(shape)


# --------------------------------------------------------------------------- #
# Batched CG dot products: per-batch <p, q> reductions in one pass
# --------------------------------------------------------------------------- #

def _bdot_kernel(p_ref, q_ref, out_ref):
    out_ref[0, 0] = jnp.sum(p_ref[:] * q_ref[:])


def bdot_pallas(p, q, force: bool = False):
    """Per-batch dot products; grid over the batch axis."""
    if not (_HAS_PALLAS and (_on_tpu() or force)):
        B = p.shape[0]
        return jnp.sum(p.reshape(B, -1) * q.reshape(B, -1), axis=1)
    B = p.shape[0]
    D = int(jnp.size(p)) // B
    p2 = p.reshape(B, D)
    q2 = q.reshape(B, D)
    out = pl.pallas_call(
        _bdot_kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, 1), p.dtype),
        in_specs=[pl.BlockSpec((1, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, D), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
    )(p2, q2)
    return out[:, 0]
