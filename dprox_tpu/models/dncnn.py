"""DnCNN / FDnCNN / IRCNN denoisers in flax.linen, NHWC.

Counterpart of
/root/reference/dprox/proxfn/pnp/denoisers/models/network_dncnn.py.
BatchNorm variants are folded at weight-conversion time (inference-only),
so the flax modules are plain conv stacks.
"""
from __future__ import annotations

import flax.linen as nn

from .blocks import Conv


class DnCNN(nn.Module):
    """Residual denoiser: x - f(x) (reference: network_dncnn.py:39-70)."""

    in_nc: int = 1
    out_nc: int = 1
    nc: int = 64
    nb: int = 17

    @nn.compact
    def __call__(self, x):
        n = Conv(self.nc, act="relu")(x)
        for _ in range(self.nb - 2):
            n = Conv(self.nc, act="relu")(n)
        n = Conv(self.out_nc)(n)
        return x - n


class FDnCNN(nn.Module):
    """Flexible DnCNN: input has a noise-level channel, direct output
    (reference: network_dncnn.py:129-150)."""

    in_nc: int = 2
    out_nc: int = 1
    nc: int = 64
    nb: int = 20

    @nn.compact
    def __call__(self, x):
        x = Conv(self.nc, act="relu")(x)
        for _ in range(self.nb - 2):
            x = Conv(self.nc, act="relu")(x)
        return Conv(self.out_nc)(x)


class IRCNN(nn.Module):
    """7-layer dilated-conv residual denoiser, dilations 1,2,3,4,3,2,1
    (reference: network_dncnn.py:74-113)."""

    in_nc: int = 1
    out_nc: int = 1
    nc: int = 64

    @nn.compact
    def __call__(self, x):
        dilations = [1, 2, 3, 4, 3, 2]
        n = x
        for d in dilations:
            n = Conv(self.nc, dilation=d, act="relu")(n)
        n = Conv(self.out_nc, dilation=1)(n)
        return x - n
