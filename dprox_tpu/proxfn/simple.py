"""Separable proxfns: nonneg projection, L1 soft-threshold, L2 shrinkage.

Counterpart of /root/reference/dprox/proxfn/{nonneg,norm}.py. These are
pure elementwise maps; on TPU they fuse into neighboring FFT/CG epilogues
under XLA (with an optional Pallas fused kernel in dprox_tpu.ops).
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import ProxFn


def soft_threshold(v, lam):
    """argmin_x lam*|x|_1 + 0.5 (x-v)^2 (reference: norm.py:6-11)."""
    return jnp.sign(v) * jnp.maximum(jnp.abs(v) - lam, 0.0)


class nonneg(ProxFn):
    """Indicator of x >= 0 (reference: nonneg.py:6-11)."""

    def _prox(self, v, lam, params=None, step=None):
        return jnp.maximum(v, 0.0)


class norm1(ProxFn):
    def _prox(self, v, lam, params=None, step=None):
        return soft_threshold(v, lam)


class norm2(ProxFn):
    def _prox(self, v, lam, params=None, step=None):
        return v / (1.0 + 2.0 * lam)
