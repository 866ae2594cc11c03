"""Super-resolution fused x-updates: SISR (DPIR trick) and MISR.

Counterpart of /root/reference/dprox/proxfn/fast/sr.py.

* ``sisr``: single-image SR with blur-then-decimate forward model; the
  x-update uses the DPIR block-mean frequency-splitting identity
  (Zhang et al.) so the sf-fold decimation inverts via sf^2 block means
  of FFT tiles — all batched FFT + reshape ops, MXU/VPU-friendly.
* ``misr``: multispectral SR via per-pixel CxC spectral normal equations
  solved by a batched linear solve on the channel axis.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...linop.base import Placeholder
from ...utils.misc import to_jax_array
from ..sum_squares import ext_sum_squares


def splits(a, sf: int):
    """Split [N,C,H,W] into sf*sf interleaved blocks -> [N,C,H/sf,W/sf,sf^2].

    (reference: sr.py:104-114.)
    """
    N, C, H, W = a.shape
    b = jnp.stack(jnp.split(a, sf, axis=2), axis=4)  # N,C,H/sf,W,sf
    b = jnp.concatenate(jnp.split(b, sf, axis=3), axis=4)  # N,C,H/sf,W/sf,sf^2
    return b


def p2o(psf, shape):
    """PSF [N,C,h,w] -> OTF [N,C,H,W] (zero-pad then roll to center at 0).

    (reference: sr.py:117-135.)
    """
    H, W = shape
    h, w = psf.shape[-2], psf.shape[-1]
    otf = jnp.zeros(psf.shape[:-2] + (H, W), psf.dtype)
    otf = otf.at[..., :h, :w].set(psf)
    otf = jnp.roll(otf, (-int(h / 2), -int(w / 2)), axis=(-2, -1))
    return jnp.fft.fftn(otf, axes=(-2, -1))


def upsample(x, sf: int = 3):
    """Zero-filling s-fold upsampler (reference: sr.py:138-147)."""
    N, C, H, W = x.shape
    z = jnp.zeros((N, C, H * sf, W * sf), x.dtype)
    return z.at[..., ::sf, ::sf].set(x)


class sisr(ext_sum_squares):
    """||S H x - y||^2 with H = conv(kernel), S = sf-decimation."""

    def __init__(self, linop, y, kernel, sf: int):
        super().__init__(linop)
        self.sf = int(sf)
        self.y = y
        self.k = kernel

    def _value(self, x, params, batch=True):
        if isinstance(x, Placeholder):
            return x.value(params)
        return to_jax_array(x, batch=batch)

    def _solve(self, xtilde, rho, n, params):
        sf = self.sf
        y = self._value(self.y, params)
        k = self._value(self.k, params)
        # accept bare 2-D/3-D kernels (the DPIR math needs [N,C,h,w])
        while k.ndim < 4:
            k = k[None]
        h, w = y.shape[-2:]
        STy = upsample(y, sf=sf)
        FB = p2o(k, (h * sf, w * sf))
        FBC = jnp.conj(FB)
        F2B = jnp.abs(FB) ** 2
        FBFy = FBC * jnp.fft.fftn(STy, axes=(-2, -1))

        lam = rho
        FR = FBFy + jnp.fft.fftn(lam * xtilde, axes=(-2, -1))
        x1 = FB * FR
        FBR = jnp.mean(splits(x1, sf), axis=-1)
        invW = jnp.mean(splits(F2B, sf), axis=-1)
        invWBR = FBR / (invW + n * lam)
        FCBinvWBR = FBC * jnp.tile(invWBR, (1, 1, sf, sf))
        FX = (FR - FCBinvWBR) / (n * lam + 1e-9)
        return jnp.real(jnp.fft.ifftn(FX, axes=(-2, -1))).astype(jnp.float32)


class misr(ext_sum_squares):
    """Multispectral SR: ||srf^T x - b||^2; per-pixel CxC normal equations.

    (reference: sr.py:8-40 — there with cached torch.inverse; here a
    batched channel-axis solve.)
    """

    def __init__(self, linop, b, srf, eps: float = 1e-7):
        super().__init__(linop, eps=eps)
        self.b = b
        self.srf = np.asarray(srf, np.float32)  # [C, 3]

    def _solve(self, xtilde, rho, n, params):
        from ...linop.base import Placeholder

        b = self.b.value(params) if isinstance(self.b, Placeholder) else to_jax_array(self.b, batch=True)
        srf = jnp.asarray(self.srf)
        N, C, H, W = xtilde.shape
        T2 = srf @ srf.T  # [C, C]
        z = b.reshape(b.shape[0], b.shape[1], -1)  # N,3,HW
        Ttz = jnp.einsum("ck,nkp->ncp", srf, z)  # N,C,HW
        v = xtilde.reshape(N, C, H * W)
        lam = jnp.broadcast_to(jnp.asarray(rho).reshape(-1)[:, None, None],
                               (N, 1, 1))
        A = T2[None] + n * lam[..., None] * jnp.eye(C)[None]
        rhs = Ttz + lam * v
        x = jnp.linalg.solve(A, rhs)
        return x.reshape(N, C, H, W).astype(jnp.float32)
