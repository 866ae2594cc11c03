"""Image deconvolution with a plug-and-play prior.

Counterpart of /root/reference/examples/applications/deconv.py (there:
FFDNet prior, ~35 dB). Offline-safe: uses the TV prior when pretrained
FFDNet weights are not cached locally.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import dprox_tpu as dp
from dprox_tpu.utils import imaging, metrics
from dprox_tpu.proxfn.pnp.hub import find_weights


def main():
    img = imaging.sample("face")
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)

    x = dp.Variable()
    data_term = dp.sum_squares(dp.conv(x, psf) - b)
    # flagship offline prior: the distilled ensemble student fused with
    # TV (weights/README.md, 35.33 dB held-out hopper at one net call
    # per prox); falls back to the reference's ffdnet_color when its
    # pretrained weights are cached locally
    denoiser = ("ffdnet_color" if find_weights("ffdnet_color.pth")
                else "distilled_color_tv")
    reg_term = dp.deep_prior(x, denoiser=denoiser)
    prob = dp.Problem(data_term + reg_term)

    rhos, sigmas = dp.log_descent(80, 25, 24)
    out = prob.solve(method="admm", x0=b, rhos=rhos, lams=sigmas, max_iter=24)

    print(f"prior={denoiser}")
    print(f"input  PSNR: {metrics.psnr(b, img):.2f} dB")
    print(f"output PSNR: {metrics.psnr(out, img):.2f} dB")


if __name__ == "__main__":
    main()
