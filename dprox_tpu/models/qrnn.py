"""QRNN3D / GRUNet hyperspectral denoisers (flax.linen, NDHWC).

Counterpart of
/root/reference/dprox/proxfn/pnp/denoisers/models/qrnn/{layer,conv,grunet,
qrnn3d}.py. The QRNN "f-pooling" recurrence along the band axis

    h_t = f_t * h_{t-1} + (1 - f_t) * z_t

is a linear recurrence: instead of the reference's sequential Python loop
over bands (layer.py:49-70), it runs as a ``jax.lax.associative_scan`` —
O(log B) depth on TPU.

The reference's BatchNorm3d sits BEFORE each conv (conv.py:57-62
BasicConv3d = bn -> conv), so it cannot be folded into the conv exactly
(zero padding happens after the BN shift); instead ``pre_bn=True``
modules carry explicit per-input-channel (bn_scale, bn_shift) params —
the inference-mode BN affine — that conversion fills from the running
stats. The qrnn3d checkpoints use bn=True; the shipped GRUNet checkpoint
is the nobn variant (models/qrnn/__init__.py:32 grunet_masked_nobn).
Decoder 'DeConv' layers are stride-1 ConvTranspose3d upstream — here
regular convs whose kernels conversion flips/transposes (exact for
s=1).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import upsample_align_corners


def fpool_scan(z: jnp.ndarray, f: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """Parallel f-pooling along axis 1 (the band/depth axis, NDHWC)."""
    if reverse:
        z = jnp.flip(z, axis=1)
        f = jnp.flip(f, axis=1)
    b = (1.0 - f) * z

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (f, b), axis=1)
    if reverse:
        h = jnp.flip(h, axis=1)
    return h


def _pre_bn(module, x):
    """Inference-mode BatchNorm as explicit per-channel affine, applied
    BEFORE the conv (reference conv.py:57-62). Init (1, 0) = identity."""
    c = x.shape[-1]
    scale = module.param("bn_scale", nn.initializers.ones, (c,))
    shift = module.param("bn_shift", nn.initializers.zeros, (c,))
    return x * scale + shift


class Conv3d(nn.Module):
    features: int
    k: Tuple[int, int, int] = (3, 3, 3)
    s: Tuple[int, int, int] = (1, 1, 1)
    bias: bool = False
    pre_bn: bool = False

    @nn.compact
    def __call__(self, x):
        if self.pre_bn:
            x = _pre_bn(self, x)
        pad = [(kk // 2, kk // 2) for kk in self.k]
        return nn.Conv(self.features, self.k, strides=self.s, padding=pad,
                       use_bias=self.bias)(x)


class UpsampleConv3d(nn.Module):
    """Trilinear align_corners upsample (1,2,2) then conv (reference:
    conv.py:33-53 — torch.nn.Upsample(mode='trilinear',
    align_corners=True); depth factor 1 makes it bilinear on H/W)."""

    features: int
    upsample: Tuple[int, int, int] = (1, 2, 2)
    k: Tuple[int, int, int] = (3, 3, 3)
    bias: bool = False
    pre_bn: bool = False

    @nn.compact
    def __call__(self, x):
        if self.pre_bn:
            x = _pre_bn(self, x)
        ud, uh, uw = self.upsample
        assert ud == 1, "depth upsampling not used by the reference zoo"
        x = upsample_align_corners(x, axes=(2, 3), factor=uh)
        assert uh == uw
        return Conv3d(self.features, k=self.k, bias=self.bias)(x)


class QRNNConv3D(nn.Module):
    """Single-direction QRNN layer (reference: layer.py:18-70, 126-130)."""

    hidden: int
    k: Tuple[int, int, int] = (3, 3, 3)
    s: Tuple[int, int, int] = (1, 1, 1)
    act: str = "tanh"
    transposed: bool = False
    upsample: Tuple[int, int, int] = None
    bn: bool = False

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        if self.upsample is not None:
            gates = UpsampleConv3d(self.hidden * 2, self.upsample, k=self.k,
                                   pre_bn=self.bn)(x)
        else:
            gates = Conv3d(self.hidden * 2, self.k, self.s, pre_bn=self.bn)(x)
        Z, F = jnp.split(gates, 2, axis=-1)
        Z = jnp.tanh(Z) if self.act == "tanh" else (nn.relu(Z) if self.act == "relu" else Z)
        F = jax.nn.sigmoid(F)
        return fpool_scan(Z, F, reverse)


class BiQRNNConv3D(nn.Module):
    """Bi-directional QRNN layer (reference: layer.py:72-123)."""

    hidden: int
    k: Tuple[int, int, int] = (3, 3, 3)
    act: str = "tanh"
    bias: bool = False
    bn: bool = False

    @nn.compact
    def __call__(self, x):
        gates = Conv3d(self.hidden * 3, self.k, bias=self.bias,
                       pre_bn=self.bn)(x)
        Z, F1, F2 = jnp.split(gates, 3, axis=-1)
        Z = jnp.tanh(Z) if self.act == "tanh" else (nn.relu(Z) if self.act == "relu" else Z)
        hl = fpool_scan(Z, jax.nn.sigmoid(F1), reverse=False)
        hr = fpool_scan(Z, jax.nn.sigmoid(F2), reverse=True)
        return hl + hr


class ConvBlock(nn.Module):
    """Residual double-QRNN block (reference: grunet.py:8-32)."""

    out_ch: int
    bn: bool = False

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        r = QRNNConv3D(self.out_ch, bn=self.bn)(x, reverse=reverse)
        r = QRNNConv3D(self.out_ch, bn=self.bn)(r, reverse=reverse)
        sc = QRNNConv3D(self.out_ch, k=(1, 1, 1), bn=self.bn)(x, reverse=reverse)
        return r + sc


class GRUnet(nn.Module):
    """5-scale QRNN UNet (reference: grunet.py:34-105). Input NDHWC with
    C=1 (+1 noise-map channel when use_noise_map)."""

    in_ch: int = 1
    out_ch: int = 1
    use_noise_map: bool = False
    # the shipped checkpoint is grunet_masked_nobn (reference
    # models/qrnn/__init__.py:32), hence bn=False here by default
    bn: bool = False
    # width multiplier: base=16 matches the reference checkpoint layout;
    # the in-repo-trained "tiny_grunet" uses base=8 (capacity beyond the
    # compact nets does not pay on the offline corpus — weights/README
    # findings 1/10)
    base: int = 16

    @nn.compact
    def __call__(self, x):
        b0 = self.base
        f = [b0, 2 * b0, 4 * b0, 8 * b0, 16 * b0]
        bn = self.bn
        e1 = BiQRNNConv3D(f[0], bn=bn)(x)
        e2 = QRNNConv3D(f[0], s=(1, 2, 2), bn=bn)(e1, reverse=True)
        e2 = ConvBlock(f[1], bn=bn)(e2)
        e3 = QRNNConv3D(f[1], s=(1, 2, 2), bn=bn)(e2, reverse=True)
        e3 = ConvBlock(f[2], bn=bn)(e3)
        e4 = QRNNConv3D(f[2], s=(1, 2, 2), bn=bn)(e3, reverse=True)
        e4 = ConvBlock(f[3], bn=bn)(e4)
        e5 = QRNNConv3D(f[3], s=(1, 2, 2), bn=bn)(e4, reverse=True)
        e5 = ConvBlock(f[4], bn=bn)(e5)

        d5 = QRNNConv3D(f[3], upsample=(1, 2, 2), bn=bn)(e5, reverse=True)
        d5 = ConvBlock(f[3], bn=bn)(jnp.concatenate([e4, d5], -1))
        d4 = QRNNConv3D(f[2], upsample=(1, 2, 2), bn=bn)(d5, reverse=True)
        d4 = ConvBlock(f[2], bn=bn)(jnp.concatenate([e3, d4], -1))
        d3 = QRNNConv3D(f[1], upsample=(1, 2, 2), bn=bn)(d4, reverse=True)
        d3 = ConvBlock(f[1], bn=bn)(jnp.concatenate([e2, d3], -1))
        d2 = QRNNConv3D(f[0], upsample=(1, 2, 2), bn=bn)(d3, reverse=True)
        d2 = ConvBlock(f[0], bn=bn)(jnp.concatenate([e1, d2], -1))

        out = BiQRNNConv3D(self.out_ch, bias=True, bn=bn)(d2)
        if self.use_noise_map:
            return out + x[..., :1]
        return out + x


class QRNNREDC3D(nn.Module):
    """QRNN3D encoder-decoder (reference: qrnn3d.py:5-47). Skip wiring is
    the reference's exactly (decoder layer -> add popped encoder skip;
    feature map re-added after the last decoder layer; band-0 input skip
    after reconstruction). The reference's config axes are supported:
    ``sample_idx`` (which encoder layers downsample), ``has_ad``
    (alternating scan direction), ``plain`` (no spatial resampling),
    ``is_2d`` (per-band (1,3,3) kernels)."""

    in_channels: int = 1
    channels: int = 16
    num_half_layer: int = 5
    sample_idx: Sequence[int] = (1, 3)
    has_ad: bool = True
    plain: bool = False
    is_2d: bool = False
    act: str = "tanh"
    # the qrnn3d/qrnn3d_masked checkpoints are bn=True (reference
    # models/qrnn/__init__.py:7-25); decoder + reconstructor convs are
    # stride-1 ConvTranspose3d upstream (kernel-transformed at
    # conversion, same math)
    bn: bool = True

    @nn.compact
    def __call__(self, x):
        k = (1, 3, 3) if self.is_2d else (3, 3, 3)
        down = (1, 1, 1) if self.plain else (1, 2, 2)
        bn = self.bn
        feat = BiQRNNConv3D(self.channels, k=k, act=self.act, bn=bn)(x)
        xs = [feat]
        out = feat
        ch = self.channels
        reverse = False
        for i in range(self.num_half_layer):
            if i in self.sample_idx:
                out = QRNNConv3D(ch * 2, k=k, s=down, act=self.act, bn=bn)(
                    out, reverse=reverse)
                ch *= 2
            else:
                out = QRNNConv3D(ch, k=k, act=self.act, bn=bn)(out,
                                                               reverse=reverse)
            xs.append(out)
            if self.has_ad:
                reverse = not reverse
        xs.pop()
        for i in reversed(range(self.num_half_layer)):
            if i in self.sample_idx:
                ch //= 2
                if self.plain:
                    out = QRNNConv3D(ch, k=k, act=self.act, bn=bn)(
                        out, reverse=reverse)
                else:
                    out = QRNNConv3D(ch, k=k, upsample=(1, 2, 2),
                                     act=self.act, bn=bn)(out, reverse=reverse)
            else:
                out = QRNNConv3D(ch, k=k, act=self.act, bn=bn)(out,
                                                               reverse=reverse)
            out = out + xs.pop()
            if self.has_ad:
                reverse = not reverse
        final_act = "none" if self.act == "relu" else self.act
        out = BiQRNNConv3D(1, k=k, bias=True, act=final_act, bn=bn)(out)
        return out + x[..., :1]
