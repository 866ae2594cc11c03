"""DRUNet (UNetRes) denoiser in flax.linen, NHWC.

Counterpart of
/root/reference/dprox/proxfn/pnp/denoisers/models/network_unet.py:67-116:
bias-free conv head, 3 scales of [nb ResBlocks + strided-conv down],
nb-ResBlock body, mirrored transpose-conv ups with additive skips, conv
tail. Input carries a noise-level map channel (in_nc = C + 1).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from .blocks import Conv, DownStrideConv, ResBlock, UpTransposeConv


class UNetRes(nn.Module):
    in_nc: int = 2
    out_nc: int = 1
    nc: Sequence[int] = (64, 128, 256, 512)
    nb: int = 4

    @nn.compact
    def __call__(self, x0):
        nc = self.nc
        x1 = Conv(nc[0], bias=False)(x0)

        def down(x, c_in, c_out):
            for _ in range(self.nb):
                x = ResBlock(c_in)(x)
            return DownStrideConv(c_out)(x)

        def up(x, c_out):
            x = UpTransposeConv(c_out)(x)
            for _ in range(self.nb):
                x = ResBlock(c_out)(x)
            return x

        x2 = down(x1, nc[0], nc[1])
        x3 = down(x2, nc[1], nc[2])
        x4 = down(x3, nc[2], nc[3])
        x = x4
        for _ in range(self.nb):
            x = ResBlock(nc[3])(x)
        x = up(x + x4, nc[2])
        x = up(x + x3, nc[1])
        x = up(x + x2, nc[0])
        return Conv(self.out_nc, bias=False)(x + x1)
