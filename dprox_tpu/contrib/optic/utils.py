"""Optics utilities: sample loading, PSF normalization, DOE sanity check.

Counterpart of /root/reference/dprox/contrib/optic/utils.py (cv2/PIL
paths gated; sample loading falls back to the synthetic deterministic
image offline).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...linop import Variable, conv_doe, eval as lin_eval, adjoint as lin_adjoint
from ...utils.imaging import sample as sample_img
from ...utils.misc import outlier_correct
from .doe_model import img_psf_conv


def center_crop(arr: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = round((h - new_h) / 2)
    left = round((w - new_w) / 2)
    return arr[top:top + new_h, left:left + new_w]


def load_sample_img(path=None, keep_ratio: bool = True, patch_size: int = 748):
    """Load (or synthesize) a [1,3,P,P] sample in [0,1]
    (reference: optic/utils.py:14-22)."""
    if path is not None:
        from PIL import Image

        img = Image.open(path)
        ps = min(img.height, img.width) if keep_ratio else patch_size
        arr = np.array(img).astype(np.float32) / 255.0
        arr = center_crop(arr, ps, ps)
        import jax

        arr = jax.image.resize(jnp.asarray(arr), (patch_size, patch_size, 3),
                               method="cubic")
        return jnp.transpose(arr, (2, 0, 1))[None]
    x = sample_img("face")
    side = min(x.shape[-2:])
    x = x[:, :, :side, :side]
    import jax

    return jax.image.resize(x, (1, 3, patch_size, patch_size), method="cubic")


def sanity_check(psf, circular: bool = True, patch_size: int = 128):
    """Verify conv_doe.forward matches img_psf_conv and the adjoint passes
    the dot-product test (reference: optic/utils.py:25-52)."""
    x = load_sample_img(patch_size=patch_size)
    expected = img_psf_conv(x, jnp.asarray(psf), circular=circular)
    op = conv_doe(Variable(), jnp.asarray(psf), circular=circular)
    out = lin_eval(op, x)
    ok = bool(jnp.allclose(out, expected, atol=1e-4))
    # adjoint dot-product check
    d = jnp.ones_like(out)
    ad = lin_adjoint(op, d)
    lhs = float(jnp.sum(out * d))
    rhs = float(jnp.sum(x * ad))
    ok = ok and abs(lhs - rhs) / (abs(lhs) + 1e-9) < 1e-3
    return ok, x, out


def normalize_psf(psf: np.ndarray, rng: float = 1.0, mode: str = "band",
                  p: float = 0.01) -> np.ndarray:
    """Per-band (or global) min-max PSF normalization with outlier
    correction, for visualization (reference: optic/utils.py:72-90)."""
    psf = np.asarray(psf, np.float32).copy()
    psf = outlier_correct(psf, p=p)
    if mode == "band":
        for c in range(psf.shape[-1]):
            lo, hi = psf[..., c].min(), psf[..., c].max()
            psf[..., c] = (psf[..., c] - lo) / (hi - lo + 1e-12)
    else:
        lo, hi = psf.min(), psf.max()
        psf = (psf - lo) / (hi - lo + 1e-12)
    return psf * rng
