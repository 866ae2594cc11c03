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
# Block-sparse (BSR) matvec: y[io[t]] += tiles[t] @ x[ii[t]]
# The LP ADMM's PCG loop applies A and A^T twice per iteration; on TPU the
# BCOO gather/scatter lowering runs at <1 GB/s effective. This kernel
# streams the dense nonzero tiles once through VMEM with scalar-prefetched
# block indices (the canonical Pallas block-sparse pattern). Output blocks
# must be visited contiguously (sorted idx_out); the kernel zero-inits the
# whole output at grid step 0, so unvisited output blocks are fine.
# --------------------------------------------------------------------------- #


def _bsr_matvec_ref(tiles, idx_in, idx_out, x_blocks, n_out_blocks):
    prod = jnp.einsum("tij,tj->ti", tiles, x_blocks[idx_in],
                      precision=jax.lax.Precision.HIGHEST)
    return jax.ops.segment_sum(prod, idx_out, n_out_blocks,
                               indices_are_sorted=True)


def _bsr_kernel(k, io_ref, ii_ref, tile_ref, x_ref, o_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    def body(j, carry):
        t = s * k + j
        xrow = x_ref[ii_ref[t]]
        prod = jnp.dot(tile_ref[j], xrow,
                       preferred_element_type=jnp.float32,
                       # full-f32 MXU passes: the PCG inside the LP
                       # ADMM cannot converge through bf16 matvecs
                       precision=jax.lax.Precision.HIGHEST)
        io = io_ref[t]
        o_ref[io] = o_ref[io] + prod
        return carry

    jax.lax.fori_loop(0, k, body, 0)


def bsr_matvec(tiles, idx_in, idx_out, x_blocks, n_out_blocks,
               force: bool = False, interpret: bool = False,
               tiles_per_step: int = 8):
    """Block-sparse matvec over (T, bm, bn) tiles.

    ``x_blocks`` is (Nb, bn); returns (n_out_blocks, bm).
    Falls back to einsum + segment_sum off-TPU.
    """
    T, bm, bn = tiles.shape
    if (T == 0 or tiles.dtype != jnp.float32
            or not (_HAS_PALLAS and (_on_tpu() or force or interpret))):
        return _bsr_matvec_ref(tiles, idx_in, idx_out, x_blocks, n_out_blocks)
    # The vectors are tiny (tens of KB) — keep x and the accumulator
    # whole in VMEM for the entire grid and stream only the tiles; rows
    # are picked by dynamic indexing on the leading dim. HBM traffic =
    # tiles once + vectors once, the speed-of-light for this op. Several
    # tiles per grid step amortize the per-step dispatch (zero-padding
    # to a multiple is harmless: zero tiles accumulate 0 into block 0).
    k = max(1, min(tiles_per_step, T))
    S = -(-T // k)
    if S * k != T:
        pad = S * k - T
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((pad, bm, bn), tiles.dtype)])
        idx_in = jnp.concatenate([jnp.asarray(idx_in, jnp.int32),
                                  jnp.zeros(pad, jnp.int32)])
        idx_out = jnp.concatenate([jnp.asarray(idx_out, jnp.int32),
                                   jnp.zeros(pad, jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((k, bm, bn), lambda s, io, ii: (s, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_bsr_kernel, k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_blocks, bm), tiles.dtype),
        interpret=interpret,
    )(jnp.asarray(idx_out, jnp.int32), jnp.asarray(idx_in, jnp.int32),
      tiles, x_blocks)


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


# --------------------------------------------------------------------------- #
# Fused CG iteration tail (BASELINE.json north-star: "CG/PCG rewritten as
# Pallas kernels"): everything in a CG step EXCEPT the matvec A(p) —
#   pAp = <p, Ap>;  alpha = rs/pAp
#   x' = x + alpha p;  r' = r - alpha Ap;  rs' = <r', r'>
#   beta = rs'/rs;     p' = r' + beta p'
# — two reductions + three axpys fused into ONE VMEM pass per batch
# element (XLA schedules the dependent reductions as separate HBM
# passes). The matvec itself stays an XLA program: for the imaging
# solvers it is FFT/conv-based, which Pallas cannot express better than
# the XLA FFT thunks. A/B vs the plain while_loop CG in
# benchmarks/cg_pallas_ab.py.
# --------------------------------------------------------------------------- #

def _cg_tail_ref(x, r, p, Ap, rs):
    B = x.shape[0]
    bdot = lambda a, b: jnp.sum(a.reshape(B, -1) * b.reshape(B, -1), axis=1)
    exp = lambda s: s.reshape((-1,) + (1,) * (x.ndim - 1))
    pAp = bdot(p, Ap)
    alpha = rs / jnp.maximum(pAp, 1e-32)
    x = x + exp(alpha) * p
    r = r - exp(alpha) * Ap
    rs_new = bdot(r, r)
    beta = rs_new / jnp.maximum(rs, 1e-32)
    p = r + exp(beta) * p
    return x, r, p, rs_new


def _cg_tail_kernel(x_ref, r_ref, p_ref, Ap_ref, rs_ref,
                    xo_ref, ro_ref, po_ref, rso_ref):
    p = p_ref[:]
    Ap = Ap_ref[:]
    rs = rs_ref[0, 0]
    pAp = jnp.sum(p * Ap)
    alpha = rs / jnp.maximum(pAp, 1e-32)
    r_new = r_ref[:] - alpha * Ap
    rs_new = jnp.sum(r_new * r_new)
    beta = rs_new / jnp.maximum(rs, 1e-32)
    xo_ref[:] = x_ref[:] + alpha * p
    ro_ref[:] = r_new
    po_ref[:] = r_new + beta * p
    rso_ref[0, 0] = rs_new


def fused_cg_tail(x, r, p, Ap, rs, force: bool = False,
                  interpret: bool = False):
    """One CG iteration minus the matvec, fused; per-batch independent.

    x/r/p/Ap: [B, ...] same shape; rs: [B]. Returns (x', r', p', rs').
    """
    if not (_HAS_PALLAS and (_on_tpu() or force or interpret)):
        return _cg_tail_ref(x, r, p, Ap, rs)
    B = x.shape[0]
    D = int(x.size) // B
    shp = x.shape
    x2, r2, p2, Ap2 = (a.reshape(B, D) for a in (x, r, p, Ap))
    rs2 = rs.reshape(B, 1)
    row = pl.BlockSpec((1, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    xo, ro, po, rso = pl.pallas_call(
        _cg_tail_kernel,
        grid=(B,),
        out_shape=(jax.ShapeDtypeStruct((B, D), x.dtype),) * 3
        + (jax.ShapeDtypeStruct((B, 1), rs.dtype),),
        in_specs=[row, row, row, row, scal],
        out_specs=(row, row, row, scal),
        interpret=interpret,
    )(x2, r2, p2, Ap2, rs2)
    return xo.reshape(shp), ro.reshape(shp), po.reshape(shp), rso[:, 0]


# --------------------------------------------------------------------------- #
# Fused TV dual-ascent denoiser: all iterations in one VMEM-resident tile pass
# --------------------------------------------------------------------------- #

def _tv_ref(y0, lam, iterations):
    from ..models.tv import tv_denoising_chw

    return tv_denoising_chw(y0, lam, iterations)


def _tv_kernel(iterations, halo, TH, T_w, W_img, H_img, y_hbm, lam_ref,
               out_ref, yt, sem):
    """One full-width row stripe: run ALL TV iterations on a halo-padded
    VMEM stripe, then write the valid center rows.

    Formulation: duals are stored at full stripe size with boundary
    duals PINNED to zero by global-coordinate masks — this reproduces
    the edge formulas of models/tv.py::tv_denoising_chw exactly
    (out[0] = -z[0], out[-1] = z[-2] are the uniform stencil
    z[j-1]-z[j] with zeros outside the valid dual range [0, n-2]). x0
    is recomputed from y0 each iteration (only duals carry state), so
    stripe-edge garbage from the wrap-around shifts advances one row
    per iteration and the halo r = iterations keeps the written center
    exact. Full-width stripes keep the manual DMA to a single
    sublane-aligned dynamic offset — 2-D halo windows lower to a
    tpu.memref_slice this backend rejects.
    """
    i = pl.program_id(0)
    r = halo  # >= iterations; rounded so the DMA height is 8-aligned
    T_h = TH + 2 * r
    dma = pltpu.make_async_copy(y_hbm.at[:, pl.ds(i * TH, T_h), :], yt, sem)
    dma.start()
    dma.wait()
    y0 = yt[:]
    lam = lam_ref[0, 0]
    alpha = 5.0

    # global coords of local cells (padded origin sits at global -r)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (T_h, T_w), 0) + i * TH - r
    col_g = jax.lax.broadcasted_iota(jnp.int32, (T_h, T_w), 1) - r
    maskh = ((col_g >= 0) & (col_g <= W_img - 2)
             & (row_g >= 0) & (row_g <= H_img - 1)).astype(y0.dtype)[None]
    maskv = ((row_g >= 0) & (row_g <= H_img - 2)
             & (col_g >= 0) & (col_g <= W_img - 1)).astype(y0.dtype)[None]

    def sh_p(x, axis):  # x[..., k-1] (shift +1), wrap = tile-edge garbage
        if axis == 2:
            return jnp.concatenate([x[..., -1:], x[..., :-1]], 2)
        return jnp.concatenate([x[:, -1:, :], x[:, :-1, :]], 1)

    def sh_m(x, axis):  # x[..., k+1] (shift -1)
        if axis == 2:
            return jnp.concatenate([x[..., 1:], x[..., :1]], 2)
        return jnp.concatenate([x[:, 1:, :], x[:, :1, :]], 1)

    zh = jnp.zeros_like(y0)
    zv = jnp.zeros_like(y0)
    x0 = y0
    for _ in range(iterations):
        dht = sh_p(zh, 2) - zh       # zh[j-1] - zh[j]
        dvt = sh_p(zv, 1) - zv
        x0 = y0 - 0.5 * (dht + dvt)
        dh = sh_m(x0, 2) - x0        # x0[j+1] - x0[j]
        dv = sh_m(x0, 1) - x0
        zh = maskh * jnp.clip(zh + (1.0 / alpha) * dh, -lam / 2, lam / 2)
        zv = maskv * jnp.clip(zv + (1.0 / alpha) * dv, -lam / 2, lam / 2)
    Wo = -(-W_img // 128) * 128  # output stripe width (lane-aligned)
    out_ref[:] = x0[:, r:r + TH, r:r + Wo]


def tv_denoise_chw_pallas(y0, lam, iterations: int = 10, tile: int = 128,
                          force: bool = False, interpret: bool = False):
    """TV dual ascent on [B, H, W] with every iteration fused in VMEM.

    XLA cannot fuse across the fori_loop iterations of the reference
    formulation, so each of the ~6 stencil ops per iteration round-trips
    the full plane through HBM — measured 9.2 ms for 10 iterations at
    3x2048^2 on v5e (~2.5x off the bandwidth roofline). This kernel
    holds a halo-padded tile in VMEM across ALL iterations (halo =
    iterations, so tiles stay exact; masks pin the boundary duals).
    Numerically identical to models/tv.py::tv_denoising_chw (same op
    order, all-VPU f32; tests/test_pallas_ops.py pins edge agreement in
    interpret mode). Requires iterations <= (tile - 8) // 2; callers
    gate on that and fall back to the jnp path.
    """
    if not (_HAS_PALLAS and (_on_tpu() or force or interpret)):
        return _tv_ref(y0, lam, iterations)
    C, H, W = y0.shape
    # halo >= iterations, rounded up so the DMA'd stripe height stays
    # 8-aligned (Mosaic requires sublane-aligned slice shapes)
    r = -(-int(iterations) // 4) * 4
    # full-width row stripes: output blocks must be (x8, x128) in their
    # last two dims, so stripe height is 8-aligned and the width is
    # lane-padded; the DMA'd stripe carries the 2r halo on top
    TH = ((tile - 2 * r) // 8) * 8
    if TH < 8:
        return _tv_ref(y0, lam, iterations)
    Wo = -(-W // 128) * 128
    nH = -(-H // TH)
    Hp = (nH - 1) * TH + TH + 2 * r
    # the DMA'd stripe width must itself be lane-aligned
    Wp = -(-(Wo + 2 * r) // 128) * 128
    ypad = jnp.pad(y0, ((0, 0), (r, Hp - H - r), (r, Wp - W - r)))
    lam2 = jnp.asarray(lam, y0.dtype).reshape(1, 1)
    out = pl.pallas_call(
        partial(_tv_kernel, int(iterations), r, TH, Wp, W, H),
        grid=(nH,),
        out_shape=jax.ShapeDtypeStruct((C, nH * TH, Wo), y0.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((C, TH, Wo), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C, TH + 2 * r, Wp), y0.dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None),
        interpret=interpret,
    )(ypad, lam2)
    return out[:, :H, :W]
