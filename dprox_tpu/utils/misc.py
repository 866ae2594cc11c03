"""Array conversion and batching conventions.

The canonical tensor layout is BCHW float32, mirroring the reference's
conventions (/root/reference/dprox/utils/misc.py:63-145): HWC images are
auto-permuted to CHW and batched; ``debatchify`` reverses the transform.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class _TaggedArray(np.ndarray):
    """Numpy array tagged as already batched (dp.array equivalent)."""

    is_dp_array = True


def array(x) -> np.ndarray:
    """Tag an array as pre-batched so auto-batching is skipped.

    Equivalent of the reference's containar ``dp.array``
    (/root/reference/dprox/utils/containar.py:16-48).
    """
    a = np.asarray(x)
    return a.view(_TaggedArray)


def is_batched_tag(x) -> bool:
    return getattr(x, "is_dp_array", False)


def to_jax_array(x, batch: bool = False) -> jnp.ndarray:
    """Convert to a jnp array, optionally adding batch/channel dims.

    HWC (C in {1,3}) -> CHW; then unsqueeze to BCHW if ndim < 4.
    Mirrors ``to_torch_tensor`` (/root/reference/dprox/utils/misc.py:63-97).
    Arrays tagged via :func:`array` are passed through untouched.
    """
    if is_batched_tag(x):
        return jnp.asarray(x)
    if isinstance(x, jnp.ndarray):
        out = x
    else:
        out = jnp.asarray(np.asarray(x))
    if batch:
        if out.ndim == 3 and (out.shape[2] == 1 or out.shape[2] == 3):
            out = jnp.transpose(out, (2, 0, 1))
        if out.ndim < 4:
            out = out[None]
    return out


def debatchify(out: np.ndarray, squeeze: bool = False) -> np.ndarray:
    """BCHW -> CHW -> HWC -> HW depending on shape/squeeze."""
    if out.ndim == 4:
        out = out[0]
    if out.ndim == 3:
        if out.shape[0] in (1, 3):
            out = out.transpose(1, 2, 0)
        if out.shape[2] == 1 and squeeze:
            out = out[..., 0]
    return out


def to_ndarray(x, debatch: bool = False, squeeze: bool = False) -> np.ndarray:
    if isinstance(x, jnp.ndarray):
        out = np.asarray(jax.device_get(x))
    else:
        out = np.asarray(x)
        if np.iscomplexobj(out):
            # the complex->real boundary must be explicit at the caller
            # (solve(real_output=True), np.real/np.abs) — a silent
            # float32 cast here discards the imaginary part
            raise TypeError(
                "to_ndarray received a complex array; take .real / "
                "np.abs (or solve with real_output=True) explicitly")
        out = out.astype(np.float32, copy=False)
    if debatch:
        out = debatchify(out, squeeze)
    return out


def safe_sqrt(x, eps: float = 1e-8):
    return jnp.sqrt(jnp.clip(x, min=eps))


def seed_everything(seed: int):
    np.random.seed(seed)
    import random

    random.seed(seed)
    return jax.random.key(seed)


def expand_to_bchw(r: jnp.ndarray) -> jnp.ndarray:
    """[B] -> [B,1,1,1] for broadcasting against BCHW images."""
    r = jnp.asarray(r)
    if r.ndim == 1:
        return r.reshape(r.shape[0], 1, 1, 1)
    return r


def outlier_correct(arr: np.ndarray, p: float = 0.01) -> np.ndarray:
    lo, hi = np.percentile(arr, [p, 100 - p])
    return np.clip(arr, lo, hi)


def crop_center_region(arr: np.ndarray, size: int = 150) -> np.ndarray:
    h, w = arr.shape[:2]
    r0 = (h - size) // 2
    c0 = (w - size) // 2
    return arr[r0:r0 + size, c0:c0 + size]
