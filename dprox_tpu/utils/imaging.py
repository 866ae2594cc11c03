"""Sample images, PSF generators and degradation models.

TPU-native counterpart of the reference's contrib.restoration helpers
(/root/reference/dprox/contrib/restoration.py). Degradations (blurring,
mosaicing, downsampling) are implemented with JAX FFT / gather ops so
they run on device and are jit-compatible; sample data is deterministic
and generated offline-safe (no network downloads).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fft import psf2otf
from .misc import to_jax_array


# ----------------------------------------------------------------------------
# Sample data (offline-deterministic)
# ----------------------------------------------------------------------------

def _synthetic_face(h: int = 512, w: int = 512) -> np.ndarray:
    """Deterministic structured RGB test image in [0,1], HWC.

    Stand-in for scipy's ``face`` sample: smooth gradients + texture +
    sharp edges so deconvolution/demosaicing metrics are meaningful.
    """
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    rng = np.random.RandomState(0)
    base = np.stack(
        [
            0.55 + 0.35 * np.sin(2 * np.pi * (3 * xx + yy)),
            0.5 + 0.3 * np.cos(2 * np.pi * (xx - 2 * yy)),
            0.45 + 0.35 * np.sin(2 * np.pi * (xx * yy * 4 + 0.3)),
        ],
        axis=-1,
    )
    # sharp structures: boxes and circles
    for k in range(6):
        cy, cx, r = rng.randint(40, h - 40), rng.randint(40, w - 40), rng.randint(10, 60)
        mask = (yy * h - cy) ** 2 + (xx * w - cx) ** 2 < r**2
        base[mask] = rng.rand(3)
    # fine texture
    base += 0.05 * rng.randn(h, w, 3)
    return np.clip(base, 0.0, 1.0).astype(np.float32)


def sample(name: str = "face", return_tensor: bool = True):
    """Deterministic sample image in [0,1].

    Tries scipy's cached datasets first (offline cache only); falls back
    to a synthetic deterministic image of the same 768x1024 / 512x512
    flavor. Reference: /root/reference/dprox/contrib/restoration.py:14-24.
    """
    img = None
    try:  # works only if the scipy pooch cache is pre-populated
        import scipy.datasets

        if name == "face":
            img = scipy.datasets.face().astype("float32") / 255
        elif name == "ascent":
            img = (scipy.datasets.ascent().astype("float32") / 255)[..., None]
    except Exception:
        img = None
    if img is None:
        img = _synthetic_face(512, 512)
        if name == "ascent":
            img = img.mean(-1, keepdims=True)
    if return_tensor:
        return to_jax_array(img, batch=True).astype(jnp.float32)
    return img


# ----------------------------------------------------------------------------
# PSFs
# ----------------------------------------------------------------------------

def fspecial_gaussian(hsize: int, sigma: float) -> np.ndarray:
    """MATLAB fspecial('gaussian') — normalized 2-D Gaussian kernel."""
    siz = (hsize - 1.0) / 2.0
    y, x = np.meshgrid(
        np.arange(-siz, siz + 1), np.arange(-siz, siz + 1), indexing="ij"
    )
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(float).eps * h.max()] = 0
    s = h.sum()
    if s != 0:
        h = h / s
    return h.astype(np.float32)


def point_spread_function(ksize: int, sigma: float) -> np.ndarray:
    """Gaussian PSF, HW1 float32 (reference: restoration.py:27-28)."""
    return fspecial_gaussian(ksize, sigma)[..., None].astype("float32")


# ----------------------------------------------------------------------------
# Degradation models (device-side, jittable)
# ----------------------------------------------------------------------------

def blurring(img: jnp.ndarray, psf: np.ndarray) -> jnp.ndarray:
    """Circular (wrap) convolution of BCHW image with a PSF via FFT."""
    img = to_jax_array(img, batch=True)
    _, C, H, W = img.shape
    otf = psf2otf(np.asarray(psf).squeeze(), (H, W))
    otf = jnp.asarray(otf)[None, None]
    out = jnp.fft.ifft2(otf * jnp.fft.fft2(img)).real
    return out.astype(img.dtype)


def masks_CFA_Bayer(shape):
    """RGGB Bayer masks, tuple of three HxW bool arrays."""
    pattern = "RGGB"
    channels = {c: np.zeros(shape) for c in "RGB"}
    for channel, (y, x) in zip(pattern, [(0, 0), (0, 1), (1, 0), (1, 1)]):
        channels[channel][y::2, x::2] = 1
    return tuple(channels[c].astype(bool) for c in "RGB")


def bayer_mask(shape) -> np.ndarray:
    """RGGB mask as [1,3,H,W] float32."""
    R, G, B = masks_CFA_Bayer(shape)
    mask = np.stack([R, G, B], axis=0).astype(np.float32)
    return mask[None]


def mosaicing(img: jnp.ndarray) -> jnp.ndarray:
    """Apply the Bayer RGGB mask to a BCHW RGB image."""
    img = to_jax_array(img, batch=True)
    mask = jnp.asarray(bayer_mask(img.shape[-2:]))
    return mask * img


def downsampling(img: jnp.ndarray, psf: np.ndarray, sf: int):
    """Blur + decimate by ``sf``; returns (downsampled, bicubic-ish x0).

    x0 upsampling uses jax.image.resize (cubic), replacing the
    reference's cv2.INTER_CUBIC (restoration.py:50-62).
    """
    import jax.image

    img = to_jax_array(img, batch=True)
    blurred = blurring(img, psf)
    downed = blurred[..., ::sf, ::sf]
    B, C, h, w = downed.shape
    x0 = jax.image.resize(downed, (B, C, h * sf, w * sf), method="cubic")
    return downed, x0
