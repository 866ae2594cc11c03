"""Non-local-means prior (shift-stack implementation).

Counterpart of /root/reference/dprox/proxfn/nlm/{nlm,patch_nlm}.py: the
"fast" NLM denoiser built from rolled shift-stacks and box-filter sums —
pure elementwise/roll ops that XLA fuses well on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.misc import safe_sqrt
from .base import ProxFn

EPSILON = 1e-6


def rgb_to_luminance(rgb):
    return (0.299 * rgb[:, :1] + 0.587 * rgb[:, 1:2] + 0.114 * rgb[:, 2:3])


def _box_sum(t, patch_size: int):
    r = patch_size // 2
    out = jnp.zeros_like(t)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out = out + jnp.roll(t, (dy, dx), axis=(2, 3))
    return out


def nlm_denoise(rgb, sigma, search_window_size: int = 11, patch_size: int = 5):
    """(reference: nlm/nlm.py:9-28, loop form to bound memory)."""
    h = sigma * 2.0
    y = rgb_to_luminance(rgb)
    r = search_window_size // 2
    num = jnp.zeros_like(rgb)
    den = jnp.zeros_like(y)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted_rgb = jnp.roll(rgb, (dy, dx), axis=(2, 3))
            shifted_y = jnp.roll(y, (dy, dx), axis=(2, 3))
            dist = jnp.sqrt(_box_sum((y - shifted_y) ** 2, patch_size))
            w = jnp.exp(-dist / (jnp.maximum(h, 0.0) + EPSILON))
            num = num + shifted_rgb * w
            den = den + w
    return jnp.clip(num / den, 0.0, 1.0)


class patch_nlm(ProxFn):
    """(reference: nlm/patch_nlm.py:5-14)"""

    def __init__(self, linop, search_window_size: int = 11, patch_size: int = 5):
        super().__init__(linop)
        self.search_window_size = search_window_size
        self.patch_size = patch_size

    def _prox(self, v, lam, params=None, step=None):
        sigma = safe_sqrt(lam)
        return nlm_denoise(v, sigma, self.search_window_size, self.patch_size)
