"""FFT helpers with the two conventions the framework relies on.

Two distinct FFT conventions coexist (mirroring the reference semantics,
cf. /root/reference/dprox/utils/misc.py:167-195 and
/root/reference/dprox/linop/conv.py:32-43):

* ``fft2_center`` / ``ifft2_center`` — centered, orthonormal 2-D FFT
  (ifftshift -> fft2(norm='ortho') -> fftshift). Used by the CS-MRI fast
  prox and masked-Fourier operators.
* plain ``jnp.fft.fft2`` over the last two axes (uncentered, unnormalized)
  — used by circular-convolution operators and the frequency-diagonal
  least-squares solve.

Also provides a MATLAB-compatible ``psf2otf`` (cf.
/root/reference/dprox/utils/psf2otf.py) computed host-side in NumPy since
PSF kernels are static compile-time data, plus ``psf2otf_traced`` for
PSFs that are traced JAX values (DOE optics co-design).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fft2_center(x: jnp.ndarray) -> jnp.ndarray:
    """Centered orthonormal 2-D FFT over the last two axes."""
    x = jnp.fft.ifftshift(x, axes=(-2, -1))
    x = jnp.fft.fft2(x, norm="ortho")
    return jnp.fft.fftshift(x, axes=(-2, -1))


def ifft2_center(x: jnp.ndarray) -> jnp.ndarray:
    """Centered orthonormal 2-D inverse FFT over the last two axes."""
    x = jnp.fft.ifftshift(x, axes=(-2, -1))
    x = jnp.fft.ifft2(x, norm="ortho")
    return jnp.fft.fftshift(x, axes=(-2, -1))


def psf2otf(psf: np.ndarray, out_shape) -> np.ndarray:
    """Convert a (static, host-side) PSF to its OTF.

    Zero-pads ``psf`` to ``out_shape``, circularly shifts so the PSF
    center lands at index (0, ..., 0), and FFTs. Matches MATLAB's
    ``psf2otf`` (reference: /root/reference/dprox/utils/psf2otf.py:11-40).
    """
    psf = np.asarray(psf, dtype=np.float64)
    out_shape = tuple(int(s) for s in out_shape)
    while psf.ndim < len(out_shape):
        psf = psf[..., None]
    psf_shape = psf.shape
    if any(p > o for p, o in zip(psf_shape, out_shape)):
        raise ValueError(f"psf shape {psf_shape} exceeds out_shape {out_shape}")
    if np.all(psf == 0):
        return np.zeros(out_shape, dtype=np.complex128)
    pad = [(0, o - p) for p, o in zip(psf_shape, out_shape)]
    psf = np.pad(psf, pad, mode="constant")
    for axis, p in enumerate(psf_shape):
        psf = np.roll(psf, -int(np.floor(p / 2)), axis=axis)
    otf = np.fft.fftn(psf)
    n_ops = np.sum(psf.size * np.log2(np.array(psf.shape)))
    otf = np.real_if_close(otf, tol=float(n_ops))
    return otf


def psf2otf_traced(psf: jnp.ndarray, out_hw, torch_compat_shift: bool = True) -> jnp.ndarray:
    """OTF of a traced PSF value, shape [..., fh, fw] -> [..., H, W].

    Pads the PSF symmetrically to (H, W) then ifftshifts so its center
    sits at (0, 0) before the FFT (reference: psf2otf2 at
    /root/reference/dprox/linop/conv.py:59-80). Differentiable w.r.t.
    ``psf`` — used for DOE PSF co-design where the PSF is learned.

    torch_compat_shift: the reference calls ``torch.fft.ifftshift`` with
    no dims, shifting EVERY axis — for a [1,3,h,w] RGB PSF this also
    rolls the channel axis by one, permuting the per-color OTFs. That is
    physically wrong but baked into the reference's trained DOE
    checkpoints (the learned height map compensates), so it is the
    default for checkpoint compatibility; pass False for the physically
    correct spatial-only shift.
    """
    H, W = int(out_hw[0]), int(out_hw[1])
    fh, fw = psf.shape[-2], psf.shape[-1]
    if (H, W) != (fh, fw):
        padh, padw = H - fh, W - fw
        if padh % 2 != 0:
            top, bottom = -(-padh // 2), padh // 2
        else:
            top, bottom = padh // 2 + 1, padh // 2 - 1
        if padw % 2 != 0:
            left, right = -(-padw // 2), padw // 2
        else:
            left, right = padw // 2 + 1, padw // 2 - 1
        pad = [(0, 0)] * (psf.ndim - 2) + [(top, bottom), (left, right)]
        psf = jnp.pad(psf, pad, mode="constant")
    axes = tuple(range(psf.ndim)) if torch_compat_shift else (-2, -1)
    psf = jnp.fft.ifftshift(psf, axes=axes)
    return jnp.fft.fft2(psf)
