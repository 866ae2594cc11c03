"""Shared building blocks for the denoiser zoo (flax.linen, NHWC).

Counterpart of /root/reference/dprox/proxfn/pnp/denoisers/models/basicblock.py
reduced to the pieces the zoo actually uses. All modules run NHWC (TPU
conv-friendly); pixel shuffle/unshuffle keep torch's channel ordering so
pretrained NCHW checkpoints convert weight-for-weight.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


def pixel_unshuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[N,H,W,C] -> [N,H/r,W/r,C*r^2] with torch channel order c*r^2+dy*r+dx."""
    N, H, W, C = x.shape
    x = x.reshape(N, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # N,H/r,W/r,C,r,r
    return x.reshape(N, H // r, W // r, C * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of :func:`pixel_unshuffle` (torch channel order)."""
    N, H, W, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(N, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # N,H,r,W,r,C
    return x.reshape(N, H * r, W * r, C)


def upsample_align_corners(x: jnp.ndarray, axes: Sequence[int],
                           factor: int = 2) -> jnp.ndarray:
    """Linear upsample with torch's ``align_corners=True`` grid.

    jax.image.resize uses half-pixel centers, so it does NOT match
    torch ``nn.Upsample(mode='bilinear'/'trilinear',
    align_corners=True)`` (unet/unet.py:96, qrnn/conv.py:44 in the
    reference). align_corners maps output j to source j*(N-1)/(M-1):
    implemented per axis as a gather + lerp (XLA fuses the pair).
    """
    for axis in axes:
        n = x.shape[axis]
        m = n * factor
        if n == 1:
            x = jnp.repeat(x, factor, axis=axis)
            continue
        pos = jnp.arange(m, dtype=jnp.float32) * ((n - 1) / (m - 1))
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        w = (pos - lo).astype(x.dtype)
        shape = [1] * x.ndim
        shape[axis] = m
        w = w.reshape(shape)
        x = jnp.take(x, lo, axis=axis) * (1 - w) + jnp.take(x, hi, axis=axis) * w
    return x


def replication_pad_to_even(x: jnp.ndarray, multiple: int = 2):
    """Pad H/W (edge mode) up to the next multiple; returns (x, h, w)."""
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x, h, w


class Conv(nn.Module):
    """3x3 conv (+ optional ReLU/LeakyReLU), bias configurable."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    bias: bool = True
    act: str = ""  # "", "relu", "lrelu"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=self.dilation * (self.kernel - 1) // 2,
                    use_bias=self.bias)(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "lrelu":
            x = nn.leaky_relu(x, 0.2)
        return x


class ResBlock(nn.Module):
    """Conv-ReLU-Conv residual block (DRUNet style, no bias)."""

    features: int
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        r = Conv(self.features, bias=self.bias, act="relu")(x)
        r = Conv(self.features, bias=self.bias)(r)
        return x + r


class DownStrideConv(nn.Module):
    """2x2 stride-2 downsampling conv (DRUNet 'strideconv')."""

    features: int
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (2, 2), strides=(2, 2), padding="VALID",
                       use_bias=self.bias)(x)


class UpTransposeConv(nn.Module):
    """2x2 stride-2 transpose conv (DRUNet 'convtranspose')."""

    features: int
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                padding="VALID", use_bias=self.bias)(x)
