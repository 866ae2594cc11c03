"""Initialization helpers: bilinear demosaicking, SR pixel shift.

Counterpart of /root/reference/dprox/utils/init/{mosaic,sr}.py in JAX
(grouped circular conv for the bilinear demosaic; map_coordinates for
the fractional SR pixel shift instead of scipy interp2d).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def demosaic_bilinear(bayer_rggb: jnp.ndarray) -> jnp.ndarray:
    """Bilinear demosaicking of packed Bayer planes.

    Input: [N,4,H/2,W/2] (R, G1, G2, B planes) -> [N,3,H,W]
    (reference: init/mosaic.py:33-54).
    """
    imgs = jnp.asarray(bayer_rggb)
    N, _, h, w = imgs.shape
    H, W = h * 2, w * 2
    rgb = jnp.zeros((N, 3, H, W), imgs.dtype)
    rgb = rgb.at[:, 0, 0::2, 0::2].set(imgs[:, 0])
    rgb = rgb.at[:, 1, 0::2, 1::2].set(imgs[:, 1])
    rgb = rgb.at[:, 1, 1::2, 0::2].set(imgs[:, 2])
    rgb = rgb.at[:, 2, 1::2, 1::2].set(imgs[:, 3])

    k_r = 0.25 * jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], imgs.dtype)
    k_g = 0.25 * jnp.asarray([[0, 1, 0], [1, 4, 1], [0, 1, 0]], imgs.dtype)

    padded = jnp.pad(rgb, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="wrap")

    def conv_band(band, k):
        return jax.lax.conv_general_dilated(
            band[:, None], k[None, None], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]

    r = conv_band(padded[:, 0], k_r)
    g = conv_band(padded[:, 1], k_g)
    b = conv_band(padded[:, 2], k_r)
    return jnp.stack([r, g, b], axis=1)


def demosaic_from_mosaiced(mosaiced: jnp.ndarray) -> jnp.ndarray:
    """Bilinear init from a masked RGB mosaic [N,3,H,W] (RGGB).

    Convenience used as x0 for demosaicking problems."""
    m = jnp.asarray(mosaiced)
    planes = jnp.stack([
        m[:, 0, 0::2, 0::2],
        m[:, 1, 0::2, 1::2],
        m[:, 1, 1::2, 0::2],
        m[:, 2, 1::2, 1::2],
    ], axis=1)
    return demosaic_bilinear(planes)


def demosaic_ea(mosaiced) -> jnp.ndarray:
    """Edge-aware demosaicking init from a masked RGB mosaic [N,3,H,W].

    Uses OpenCV's edge-aware Bayer interpolation when available (the
    reference's dpir demosaic example calls
    cv2.cvtColor(CFA, COLOR_BAYER_BG2RGB_EA) and notes it is essential
    for strong PnP demosaic results: examples/papers/dpir_tpami_2020/
    rgb_demosaic.py:21). Falls back to Malvar when cv2 is absent.
    """
    m = np.asarray(mosaiced, np.float32)
    try:
        import cv2

        cfa = np.clip(m.sum(axis=1) * 255.0 + 0.5, 0, 255).astype(np.uint8)
        out = np.stack([
            cv2.cvtColor(c, cv2.COLOR_BAYER_BG2RGB_EA).astype(np.float32)
            / 255.0 for c in cfa
        ])
        return jnp.asarray(np.transpose(out, (0, 3, 1, 2)))
    except Exception:
        # cv2 absent or its lazy loader unhappy under this process state
        planes = np.stack([m[:, 0, 0::2, 0::2], m[:, 1, 0::2, 1::2],
                           m[:, 1, 1::2, 0::2], m[:, 2, 1::2, 1::2]], axis=1)
        return demosaic_malvar(jnp.asarray(planes))


def shift_pixel(x, sf: int, upper_left: bool = True):
    """Fractional pixel shift for SR init (reference: init/sr.py:4-31).

    x: HxW or HxWxC numpy/jnp array.
    """
    from jax.scipy.ndimage import map_coordinates

    x = jnp.asarray(x)
    h, w = x.shape[:2]
    shift = (sf - 1) * 0.5
    yv, xv = jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32)
    if upper_left:
        y1, x1 = yv + shift, xv + shift
    else:
        y1, x1 = yv - shift, xv - shift
    y1 = jnp.clip(y1, 0, h - 1)
    x1 = jnp.clip(x1, 0, w - 1)
    yy, xx = jnp.meshgrid(y1, x1, indexing="ij")

    if x.ndim == 2:
        return map_coordinates(x, [yy, xx], order=1)
    out = [map_coordinates(x[..., c], [yy, xx], order=1)
           for c in range(x.shape[-1])]
    return jnp.stack(out, axis=-1)


def demosaic_malvar(bayer_rggb: jnp.ndarray) -> jnp.ndarray:
    """Malvar-He-Cutler ("matlab") demosaicking of packed Bayer planes.

    Input: [N,4,H/2,W/2] (R, G1, G2, B) -> [N,3,H,W]
    (reference: init/mosaic.py:57-108).
    """
    imgs = jnp.asarray(bayer_rggb)
    N, _, h, w = imgs.shape
    H, W = h * 2, w * 2
    kgrb = (1 / 8) * jnp.asarray(
        [[0, 0, -1, 0, 0], [0, 0, 2, 0, 0], [-1, 2, 4, 2, -1],
         [0, 0, 2, 0, 0], [0, 0, -1, 0, 0]], jnp.float32)
    krbg0 = (1 / 8) * jnp.asarray(
        [[0, 0, 0.5, 0, 0], [0, -1, 0, -1, 0], [-1, 4, 5, 4, -1],
         [0, -1, 0, -1, 0], [0, 0, 0.5, 0, 0]], jnp.float32)
    krbg1 = krbg0.T
    krbbr = (1 / 8) * jnp.asarray(
        [[0, 0, -1.5, 0, 0], [0, 2, 0, 2, 0], [-1.5, 0, 6, 0, -1.5],
         [0, 2, 0, 2, 0], [0, 0, -1.5, 0, 0]], jnp.float32)
    k = jnp.stack([kgrb, krbg0, krbg1, krbbr])[:, None]  # [4,1,5,5]

    cfa = jnp.zeros((N, 1, H, W), imgs.dtype)
    cfa = cfa.at[:, 0, 0::2, 0::2].set(imgs[:, 0])
    cfa = cfa.at[:, 0, 0::2, 1::2].set(imgs[:, 1])
    cfa = cfa.at[:, 0, 1::2, 0::2].set(imgs[:, 2])
    cfa = cfa.at[:, 0, 1::2, 1::2].set(imgs[:, 3])
    rgb = jnp.tile(cfa, (1, 3, 1, 1))

    padded = jnp.pad(cfa, ((0, 0), (0, 0), (2, 2), (2, 2)), mode="reflect")
    conv_cfa = jax.lax.conv_general_dilated(
        padded, k, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))

    rgb = rgb.at[:, 1, 0::2, 0::2].set(conv_cfa[:, 0, 0::2, 0::2])
    rgb = rgb.at[:, 1, 1::2, 1::2].set(conv_cfa[:, 0, 1::2, 1::2])
    rgb = rgb.at[:, 0, 0::2, 1::2].set(conv_cfa[:, 1, 0::2, 1::2])
    rgb = rgb.at[:, 0, 1::2, 0::2].set(conv_cfa[:, 2, 1::2, 0::2])
    rgb = rgb.at[:, 0, 1::2, 1::2].set(conv_cfa[:, 3, 1::2, 1::2])
    rgb = rgb.at[:, 2, 0::2, 1::2].set(conv_cfa[:, 2, 0::2, 1::2])
    rgb = rgb.at[:, 2, 1::2, 0::2].set(conv_cfa[:, 1, 1::2, 0::2])
    rgb = rgb.at[:, 2, 0::2, 0::2].set(conv_cfa[:, 3, 0::2, 0::2])
    return rgb
