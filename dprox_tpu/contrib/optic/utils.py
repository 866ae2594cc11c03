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


def normalize_psf(psf: np.ndarray, clip_percentile: float = 0.01,
                  bandwise: bool = False) -> np.ndarray:
    """Sum-to-one PSF normalization with outlier correction and max-1
    rescale for visualization (reference: optic/utils.py:86-110)."""
    psf = np.asarray(psf, np.float32).copy()
    if bandwise:
        psf = psf / psf.sum(axis=(0, 1), keepdims=True)
    else:
        psf = psf / psf.sum()
    psf = outlier_correct(psf, p=clip_percentile)
    return psf / psf.max()


def normalize_psf2(psf: np.ndarray, rng: float = 1.0,
                   mode: str = "band") -> np.ndarray:
    """Per-band (or global) min-max normalization, clip to [0, rng],
    re-normalize (reference: optic/utils.py:70-84)."""
    psf = np.asarray(psf, np.float32).copy()

    def norm(p):
        if mode == "band":
            for c in range(p.shape[-1]):
                lo, hi = p[..., c].min(), p[..., c].max()
                p[..., c] = (p[..., c] - lo) / (hi - lo + 1e-12)
        else:
            lo, hi = p.min(), p.max()
            p = (p - lo) / (hi - lo + 1e-12)
        return p

    return norm(np.clip(norm(psf), 0, rng))


def subplot(data, path):
    """Save a 1x3 channel grid with colorbars (reference: optic/utils.py:113-121)."""
    import matplotlib.pyplot as plt

    _, axes = plt.subplots(1, 3)
    arr = np.asarray(data)
    for i in range(3):
        im = axes[i].imshow(arr[0, i])
        plt.colorbar(im, ax=axes[i])
    plt.savefig(path)
    plt.close()


def plot(data, path):
    """Save a single image with colorbar (reference: optic/utils.py:123-131)."""
    import matplotlib.pyplot as plt

    plt.figure()
    plt.imshow(np.asarray(data).squeeze())
    plt.colorbar()
    plt.savefig(path)
    plt.close()


def plot3d(data, path, region=(200, 400)):
    """Save a 3-D surface plot of a center crop (reference: optic/utils.py:133-156)."""
    import matplotlib.pyplot as plt

    arr = np.asarray(data).squeeze()
    lo, hi = region
    lo = min(lo, max(arr.shape[0] - 1, 0))
    hi = min(hi, arr.shape[0])
    arr = arr[lo:hi, lo:hi]
    h, w = arr.shape
    X, Y = np.meshgrid(np.linspace(0, h, 50), np.linspace(0, w, 50))
    fig = plt.figure()
    ax = plt.axes(projection="3d")
    ax.plot_surface(X, Y, arr)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    plt.savefig(path)
    plt.close(fig)


class SingleImageDataset:
    """Directory-of-images dataset yielding CHW float32 arrays in [0,1]
    (stand-in for the external torchlight.data.SingleImageDataset the
    reference imports at optic/utils.py:9)."""

    def __init__(self, root: str, patch_size=None):
        from ...utils.io import list_image_files

        self.root = root
        self.paths = list_image_files(root)
        self.patch_size = patch_size

    def __len__(self):
        return len(self.paths)

    def _load(self, path):
        from PIL import Image
        import os

        img = Image.open(os.path.join(self.root, path)).convert("RGB")
        return np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0

    def __getitem__(self, index):
        return self._load(self.paths[index]), self.paths[index]


class Dataset(SingleImageDataset):
    """768x768 bicubic-resized variant (reference: optic/utils.py:158-166)."""

    def __init__(self, root: str, size: int = 768):
        super().__init__(root)
        self.size = size

    def __getitem__(self, index):
        import jax

        img, _ = super().__getitem__(index)
        img = jax.image.resize(jnp.asarray(img), (3, self.size, self.size),
                               method="cubic")
        return np.asarray(jnp.clip(img, 0, 1))
