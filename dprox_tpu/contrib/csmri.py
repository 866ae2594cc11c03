"""CS-MRI data pipeline, masks, and the prox-first CustomADMM.

Counterpart of /root/reference/dprox/contrib/csmri.py. The HF-hosted
Medical7/MICCAI datasets are unreachable offline; this module provides
the same interfaces over deterministic synthetic data (radial
undersampling masks generated locally, synthetic anatomy-like phantoms),
plus the .mat loaders for when the cached datasets exist.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..algo.admm import ADMM
from ..utils.fft import fft2_center, ifft2_center
from ..utils.misc import to_jax_array


def radial_mask(shape=(128, 128), num_lines: int = 40, seed: int = 0) -> np.ndarray:
    """Radial k-space undersampling mask (the reference downloads
    pre-generated radial_128_x masks; generated here deterministically)."""
    H, W = shape
    cy, cx = H / 2 - 0.5, W / 2 - 0.5
    mask = np.zeros(shape, bool)
    rng = np.random.RandomState(seed)
    angles = np.linspace(0, np.pi, num_lines, endpoint=False)
    angles += rng.rand(num_lines) * (np.pi / num_lines) * 0.1
    rr = np.arange(-max(H, W), max(H, W), 0.5)
    for a in angles:
        ys = np.clip(np.round(cy + rr * np.sin(a)).astype(int), 0, H - 1)
        xs = np.clip(np.round(cx + rr * np.cos(a)).astype(int), 0, W - 1)
        mask[ys, xs] = True
    return np.fft.fftshift(mask)  # mask is applied on centered spectra
    # (fftshift because the lines are drawn around the center)


def shepp_logan(size: int = 128) -> np.ndarray:
    """Simple Shepp-Logan-like phantom in [0,1], HxW."""
    yy, xx = np.meshgrid(np.linspace(-1, 1, size), np.linspace(-1, 1, size),
                         indexing="ij")
    img = np.zeros((size, size), np.float32)

    def ellipse(cx, cy, a, b, angle, val):
        ca, sa = np.cos(angle), np.sin(angle)
        x = (xx - cx) * ca + (yy - cy) * sa
        y = -(xx - cx) * sa + (yy - cy) * ca
        img[(x / a) ** 2 + (y / b) ** 2 <= 1] += val

    ellipse(0, 0, 0.69, 0.92, 0, 1.0)
    ellipse(0, -0.0184, 0.6624, 0.874, 0, -0.8)
    ellipse(0.22, 0, 0.11, 0.31, -0.31, -0.2)
    ellipse(-0.22, 0, 0.16, 0.41, 0.31, -0.2)
    ellipse(0, 0.35, 0.21, 0.25, 0, 0.1)
    ellipse(0, 0.1, 0.046, 0.046, 0, 0.1)
    ellipse(-0.08, -0.605, 0.046, 0.023, 0, 0.1)
    ellipse(0.06, -0.605, 0.023, 0.046, 0, 0.1)
    return np.clip(img, 0, 1)


def generate_sample(size: int = 128, num_lines: int = 40, sigma: float = 0.0,
                    seed: int = 0, gt=None):
    """Synthesize one CSMRI problem dict matching the reference's field
    layout (csmri.py:96-109): y0, x0, ATy0, gt, mask, params.

    ``gt``: optional [H,W] image in [0,1] to use instead of the
    Shepp-Logan phantom (task-scale training draws natural crops).

    Built host-side in numpy: complex device->host transfers are
    unimplemented on the axon TPU backend, and this is data prep anyway.
    """

    def np_fft2c(x):
        x = np.fft.ifftshift(x, axes=(-2, -1))
        x = np.fft.fft2(x, norm="ortho")
        return np.fft.fftshift(x, axes=(-2, -1))

    def np_ifft2c(x):
        x = np.fft.ifftshift(x, axes=(-2, -1))
        x = np.fft.ifft2(x, norm="ortho")
        return np.fft.fftshift(x, axes=(-2, -1))

    gt = (shepp_logan(size) if gt is None
          else np.asarray(gt, np.float32))[None]  # [1,H,W]
    mask = radial_mask((size, size), num_lines, seed)[None]
    y0 = np_fft2c(gt.astype(np.complex64))
    if sigma > 0:
        rng = np.random.RandomState(seed)
        y0 = y0 + sigma * (rng.randn(*y0.shape) + 1j * rng.randn(*y0.shape))
    y0 = np.where(mask, y0, 0).astype(np.complex64)
    ATy0 = np_ifft2c(y0).astype(np.complex64)
    return {
        "y0": y0[None],       # [1,1,H,W]
        "x0": ATy0[None],
        "ATy0": ATy0[None],
        "gt": gt[None],
        "mask": mask[None].astype(bool),
        "params": {"y": y0[None], "mask": mask[None]},
    }


def sample(name: Optional[str] = None, size: int = 128):
    """Single-problem loader (reference: csmri.py:230-258). Uses the
    reference's real assets (radial_128_2.mat mask + Medical_128 image)
    when they are present in the hub cache — drop them in and the
    reference-golden tests activate (tests/test_golden.py -k
    reference_weights) — and falls back to the synthetic phantom
    offline."""
    real = sample_reference(name or "Bust.jpg")
    if real is not None:
        return real
    return generate_sample(size=size)


def sample_reference(name: str = "Bust.jpg"):
    """Reference-exact loader of the real CSMRI sample
    (reference csmri.py:230-258: radial mask applied in the CENTERED
    ortho fft2 convention, zero-filled adjoint as x0). Returns the same
    dict shape as :func:`generate_sample`, or None when either asset
    (data/csmri/masks/radial_128_2.mat, data/csmri/Medical_128/<name>)
    is absent from the hub cache."""
    from ..utils import hub

    mask_path = hub.load_path("data/csmri/masks/radial_128_2.mat",
                              repo_type="datasets", raise_on_miss=False)
    img_path = hub.load_path(f"data/csmri/Medical_128/{name}",
                             repo_type="datasets", raise_on_miss=False)
    if mask_path is None or img_path is None:
        return None
    from PIL import Image
    from scipy.io import loadmat

    def np_fft2c(x):
        x = np.fft.ifftshift(x, axes=(-2, -1))
        x = np.fft.fft2(x, norm="ortho")
        return np.fft.fftshift(x, axes=(-2, -1))

    def np_ifft2c(x):
        x = np.fft.ifftshift(x, axes=(-2, -1))
        x = np.fft.ifft2(x, norm="ortho")
        return np.fft.fftshift(x, axes=(-2, -1))

    mask = loadmat(mask_path)["mask"].astype(bool)
    target = np.asarray(Image.open(img_path).convert("L"),
                        np.float32) / 255.0
    y0 = np_fft2c(target[None, None].astype(np.complex64))
    y0 = np.where(mask[None, None], y0, 0).astype(np.complex64)
    ATy0 = np_ifft2c(y0).astype(np.complex64)
    return {
        "y0": y0,
        "x0": ATy0,
        "ATy0": ATy0,
        "gt": target[None, None],
        "mask": mask[None, None],
        "params": {"y": y0, "mask": mask[None, None]},
    }


def load_data(path: str):
    """Load a reference-format .mat eval sample (csmri.py:98-109)."""
    from scipy.io import loadmat

    mat = loadmat(path)
    for k in ("__globals__", "__header__", "__version__"):
        mat.pop(k, None)
    if "name" in mat:
        mat["name"] = mat["name"].item()

    def c2r(x):
        return x[..., 0]

    def as_complex(x):
        return x[..., 0] + 1j * x[..., 1]

    mat["output"] = c2r(mat["ATy0"])
    mat["input"] = as_complex(mat["x0"])
    mat["x0"] = as_complex(mat["x0"])
    mat["y0"] = as_complex(mat["y0"])
    mat["mask"] = np.expand_dims(mat["mask"], 0).astype("bool")
    mat["sigma_n"] = c2r(mat["sigma_n"])
    mat["params"] = {"y": mat["y0"], "mask": mat["mask"]}
    return mat


class CSMRIDataset:
    """Iterable of synthetic CSMRI problems (the reference wraps image
    folders + random masks; csmri.py:17-86)."""

    def __init__(self, size: int = 128, num_samples: int = 8, sigma: float = 0.0,
                 num_lines=(30, 40, 50)):
        self.samples = [
            generate_sample(size, num_lines[i % len(num_lines)], sigma, seed=i)
            for i in range(num_samples)
        ]

    def __getitem__(self, i):
        return self.samples[i % len(self.samples)]

    def __len__(self):
        return len(self.samples)


class CustomADMM(ADMM):
    """Prox-first iteration order used for CSMRI
    (reference: csmri.py:156-171)."""

    def _iter(self, state, rho, lam, step, params, aux):
        x, z, u = state
        z0 = z[0]
        x_new = []
        for i, fn in enumerate(self.psi_fns):
            # prox outputs are real (denoisers act on the real part);
            # cast back so the scan carry dtype stays stable
            xi = fn.prox(z0 - u[i], lam[i], params=params, step=step,
                         offset=aux.offsets[i])
            x_new.append(xi.astype(z0.dtype))
        b = [x_new[i] + u[i] for i in range(len(self.psi_fns))]
        z_new = self.least_square.solve(b, rho, params=params,
                                        var_shapes=self._var_shapes(z0))
        # (fused ext solves have no prepare step)
        u_new = tuple(u[i] + x_new[i] - z_new for i in range(len(self.psi_fns)))
        return (x_new[0], (z_new,), u_new)

    def initialize(self, x0, params, v=None):
        if getattr(self.least_square, "complex_state", False):
            x0 = x0.astype(jnp.complex64)
        x = x0
        z = (x0,)
        u = tuple(jnp.zeros_like(x0) for _ in self.psi_fns)
        return (x, z, u)


def complex2channel(x):
    """[B,1,H,W] complex -> [B,2,H,W] (re, im) channels."""
    x = jnp.asarray(x)
    return jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=1)


def custom_policy_ob_pack_fn(variables, x0, T, aux_state):
    """CSMRI policy observation: solver variables + k-space data + mask +
    time + noise channels (reference: csmri.py:221-229)."""
    parts = [variables, x0, T]
    if aux_state is not None:
        parts.insert(1, complex2channel(jnp.asarray(aux_state["y0"])))
        parts.append(jnp.asarray(aux_state["mask"]).astype(jnp.float32))
        if "sigma_n" in aux_state:
            parts.append(jnp.asarray(aux_state["sigma_n"]).astype(jnp.float32))
    return jnp.real(jnp.concatenate(parts, axis=1))
