"""FFDNet denoiser (Zhang et al., TIP 2018) in flax.linen, NHWC.

Counterpart of
/root/reference/dprox/proxfn/pnp/denoisers/models/network_ffdnet.py:27-69:
pixel-unshuffle (sf=2) -> concat noise-level map -> nb conv(+ReLU) stack
-> pixel-shuffle, with replication padding for odd sizes.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .blocks import Conv, pixel_shuffle, pixel_unshuffle, replication_pad_to_even


class FFDNet(nn.Module):
    in_nc: int = 1
    out_nc: int = 1
    nc: int = 64
    nb: int = 15
    # residual=True predicts the NOISE and returns input - residual, so
    # sigma->0 degenerates to identity (critical for late PnP iterations,
    # where a direct-prediction net caps reconstruction quality at its
    # own low-sigma fidelity). The reference architecture and its
    # checkpoints predict the image directly (network_ffdnet.py:27-69),
    # so False stays the torch-checkpoint-compatible default; the
    # in-repo-trained priors use True.
    residual: bool = False

    @nn.compact
    def __call__(self, x, sigma):
        """x: [N,H,W,C]; sigma: scalar or [N] / [N,1,1,1] noise level."""
        x_in = x
        x, h, w = replication_pad_to_even(x, 2)
        x = pixel_unshuffle(x, 2)
        sigma = jnp.asarray(sigma, x.dtype)
        sigma = sigma.reshape((-1,) + (1,) * 3)  # [N or 1, 1,1,1]
        m = jnp.ones_like(x[..., :1]) * sigma
        x = jnp.concatenate([x, m], axis=-1)
        x = Conv(self.nc, act="relu")(x)
        for _ in range(self.nb - 2):
            x = Conv(self.nc, act="relu")(x)
        x = Conv(self.out_nc * 4)(x)
        x = pixel_shuffle(x, 2)
        x = x[:, :h, :w, :]
        return x_in - x if self.residual else x


class FFDNet3D(nn.Module):
    """Variant with the sigma map concatenated by the caller
    (reference: network_ffdnet.py:72-113)."""

    in_nc: int = 32
    out_nc: int = 31
    nc: int = 64
    nb: int = 15

    @nn.compact
    def __call__(self, x):
        x, h, w = replication_pad_to_even(x, 2)
        x = pixel_unshuffle(x, 2)
        x = Conv(self.nc, act="relu")(x)
        for _ in range(self.nb - 2):
            x = Conv(self.nc, act="relu")(x)
        x = Conv(self.out_nc * 4)(x)
        x = pixel_shuffle(x, 2)
        return x[:, :h, :w, :]
