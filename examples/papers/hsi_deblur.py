"""Hyperspectral image deblurring with a 3-D recurrent (GRUNet) prior.

Counterpart of /root/reference/examples/papers/dphsir_neurcomputing_2022/
hsi_deblur.py (there: grunet prior, 54-55 dB mPSNR with pretrained
weights). Offline-safe: falls back to the 3-D TV prior; synthetic
hyperspectral cube built from shifted/filtered copies of the sample.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.utils import imaging, metrics
from dprox_tpu.proxfn.pnp.hub import find_weights
from dprox_tpu.proxfn.pnp.denoisers import TVDenoiser


def synthetic_hsi(bands: int = 16, size: int = 64) -> np.ndarray:
    """[1, bands, H, W] cube: band-wise spectral mixing of the sample."""
    rgb = np.asarray(imaging.sample("face"))[0, :, :size, :size]
    ws = np.stack([np.array([np.cos(0.2 * b), np.sin(0.15 * b) ** 2, 0.5 + 0.5 * np.cos(0.3 * b)])
                   for b in range(bands)])
    ws = np.abs(ws) / np.abs(ws).sum(1, keepdims=True)
    cube = np.einsum("bc,chw->bhw", ws, rgb)
    return cube[None].astype(np.float32)


def main():
    cube = synthetic_hsi()
    psf = imaging.point_spread_function(9, 3)
    b = imaging.blurring(jnp.asarray(cube), psf)

    x = dp.Variable()
    data_term = dp.sum_squares(dp.conv(x, psf) - b)
    if find_weights("unet_qrnn3d.pth"):
        from dprox_tpu.proxfn.pnp.grunet import GRUNetDenoiser

        denoiser = GRUNetDenoiser(ckpt_path=find_weights("unet_qrnn3d.pth"))
        name = "grunet"
    else:
        denoiser = TVDenoiser(iter_num=10, use_3dtv=True)
        name = "tv3d"
    reg_term = dp.deep_prior(x, denoiser, sqrt=True)
    solver = dp.compile(data_term + reg_term, method="admm")

    rhos, sigmas = dp.log_descent(35, 10, 24)
    out = solver.solve(x0=b, rhos=rhos, lams=sigmas, max_iter=24)

    def as_hwc(t):
        return np.transpose(np.asarray(t)[0], (1, 2, 0))

    print(f"prior={name}")
    print(f"blurred mPSNR: {metrics.mpsnr(as_hwc(b), as_hwc(cube)):.2f} dB")
    print(f"solved  mPSNR: {metrics.mpsnr(as_hwc(out), as_hwc(cube)):.2f} dB")


if __name__ == "__main__":
    main()
