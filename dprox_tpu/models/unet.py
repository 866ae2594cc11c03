"""Small residual UNet denoiser (the CSMRI 'unet-nm' prior) in flax.linen.

Counterpart of
/root/reference/dprox/proxfn/pnp/denoisers/models/unet/unet.py:34-64:
32-512 channel encoder with maxpool downs and 3-layer LeakyReLU(0.2)
conv blocks, bilinear-upsample decoder with concat skips, residual
output added to the (first C channels of the) input.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .blocks import Conv, upsample_align_corners


class ConvBlock(nn.Module):
    features: int
    num_layer: int = 3

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layer):
            x = Conv(self.features, act="lrelu")(x)
        return x


def _maxpool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample2(x):
    # torch nn.Upsample(bilinear, align_corners=True) — reference
    # unet/unet.py:96; jax.image.resize (half-pixel) does not match it
    return upsample_align_corners(x, axes=(1, 2), factor=2)


class UNet(nn.Module):
    in_channels: int = 2
    out_channels: int = 1

    @nn.compact
    def __call__(self, x):
        noisy = x
        x1 = ConvBlock(32)(x)
        x2 = ConvBlock(64)(_maxpool2(x1))
        x3 = ConvBlock(128)(_maxpool2(x2))
        x4 = ConvBlock(256)(_maxpool2(x3))
        x5 = ConvBlock(512)(_maxpool2(x4))

        def up(x, skip, feats):
            x = _upsample2(x)
            # pad to skip's spatial size (odd-dim safety, mirrors F.pad usage)
            dh = skip.shape[1] - x.shape[1]
            dw = skip.shape[2] - x.shape[2]
            if dh or dw:
                x = jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2),
                                (dw // 2, dw - dw // 2), (0, 0)))
            x = jnp.concatenate([skip, x], axis=-1)
            return ConvBlock(feats)(x)

        x = up(x5, x4, 256)
        x = up(x, x3, 128)
        x = up(x, x2, 64)
        x = up(x, x1, 32)
        residual = nn.Conv(self.out_channels, (1, 1))(x)
        return noisy[..., : self.out_channels] + residual
