"""Joint demosaicking + deconvolution — the CG (non-diagonalizable) path.

Counterpart of /root/reference/examples/applications/joint_demosaic_deconv.py
and tests/problem/test_jd23.py: mosaic(conv(x)) has no (freq-)diagonal
Gram, so the x-update runs the matrix-free implicit-gradient CG solver.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import dprox_tpu as dp
from dprox_tpu.utils import imaging, metrics, demosaic_from_mosaiced
from dprox_tpu.proxfn.pnp.hub import find_weights


def main():
    img = imaging.sample("face")
    psf = imaging.point_spread_function(15, 3)
    blurred = imaging.blurring(img, psf)
    b = imaging.mosaicing(blurred)

    x = dp.Variable()
    data_term = dp.sum_squares(dp.mosaic(dp.conv(x, psf)) - b)
    # strongest offline prior: residual FFDNet + TV fusion
    # (weights/README.md)
    denoiser = ("ffdnet_color" if find_weights("ffdnet_color.pth")
                else "res_ffdnet_color_tv")
    reg_term = dp.deep_prior(x, denoiser=denoiser)

    solver = dp.compile(data_term + reg_term, method="admm",
                        linear_solve_config=dp.LinearSolveConfig(max_iters=50))
    assert not solver.least_square.freq_diagonalizable  # CG path

    init = demosaic_from_mosaiced(b)
    rhos, sigmas = dp.log_descent(80, 30, 5)
    out = solver.solve(x0=init, rhos=rhos, lams=sigmas, max_iter=5)

    print(f"input  PSNR: {metrics.psnr(b, img):.2f} dB")
    print(f"solved PSNR: {metrics.psnr(out, img):.2f} dB")


if __name__ == "__main__":
    main()
