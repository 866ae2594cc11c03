"""Deep-optics baseline U-Net in flax.linen (NHWC).

Counterpart of /root/reference/dprox/contrib/optic/unet.py:27-110: the
reconstruction baseline used against the unrolled-ADMM pipeline in the
end-to-end optics paper experiments. Residual conv blocks (two 3x3
convs + LeakyReLU(0.01) with a 1x1-conv shortcut), stride-2 4x4 conv
downsampling, 2x2 transpose-conv upsampling with concat skips, and
circular padding to a multiple of 32 (unet.py:7-24).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


def pad_to_ratio_of_32(x: jnp.ndarray) -> jnp.ndarray:
    """Circular-pad NHWC input so H and W are multiples of 32."""
    _, h, w, _ = x.shape
    ph = (-h) % 32
    pw = (-w) % 32
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="wrap")
    return x


def unpad_from_ratio_of_32(x: jnp.ndarray, shape) -> jnp.ndarray:
    """Crop back to the original NHWC spatial shape."""
    return x[:, : shape[1], : shape[2], :]


class OpticsConvBlock(nn.Module):
    """conv_block of unet.py:27-41: (3x3 conv + LeakyReLU(0.01)) x2
    plus a 1x1-conv residual shortcut."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), padding=1)(x)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Conv(self.features, (3, 3), padding=1)(y)
        y = nn.leaky_relu(y, 0.01)
        return y + nn.Conv(self.features, (1, 1))(x)


class OpticsUNet(nn.Module):
    """U_Net of unet.py:44-110 (a.k.a. ``dprox.contrib.optic.U_Net``)."""

    in_channels: int = 3
    out_channels: int = 3
    base_features: int = 32

    @nn.compact
    def __call__(self, x):
        shape = x.shape
        x = pad_to_ratio_of_32(x)
        f = [self.base_features * (2 ** i) for i in range(5)]

        e1 = OpticsConvBlock(f[0])(x)
        e2 = OpticsConvBlock(f[1])(
            nn.Conv(f[0], (4, 4), strides=(2, 2), padding=1)(e1))
        e3 = OpticsConvBlock(f[2])(
            nn.Conv(f[1], (4, 4), strides=(2, 2), padding=1)(e2))
        e4 = OpticsConvBlock(f[3])(
            nn.Conv(f[2], (4, 4), strides=(2, 2), padding=1)(e3))
        e5 = OpticsConvBlock(f[4])(
            nn.Conv(f[3], (4, 4), strides=(2, 2), padding=1)(e4))

        def up(x, skip, feats):
            x = nn.ConvTranspose(feats, (2, 2), strides=(2, 2))(x)
            x = jnp.concatenate([skip, x], axis=-1)
            return OpticsConvBlock(feats)(x)

        d = up(e5, e4, f[3])
        d = up(d, e3, f[2])
        d = up(d, e2, f[1])
        d = up(d, e1, f[0])
        out = nn.Conv(self.out_channels, (1, 1))(d)
        return unpad_from_ratio_of_32(out, shape)
