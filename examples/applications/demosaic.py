"""Joint demosaicking via the absorbed weighted-sum-squares path.

Counterpart of /root/reference/examples/applications/demosaic.py.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.utils import imaging, metrics, demosaic_from_mosaiced
from dprox_tpu.proxfn.pnp.hub import find_weights


def main():
    img = imaging.sample("face")
    b = imaging.mosaicing(img)
    x0 = imaging.bayer_mask(img.shape[-2:])  # for reference only

    x = dp.Variable()
    data_term = dp.sum_squares(dp.mosaic(x), b=dp.utils.array(np.asarray(b)))
    # the Malvar init is already strong on noiseless mosaics; a gentle
    # fusion-prior schedule is the only one measured to improve on it
    denoiser = ("ffdnet_color" if find_weights("ffdnet_color.pth")
                else "res_ffdnet_color_tv")
    reg_term = dp.deep_prior(x, denoiser=denoiser)
    prob = dp.Problem(data_term + reg_term)

    init = demosaic_from_mosaiced(b)
    rhos, sigmas = dp.log_descent(15, 3, 24)
    out = prob.solve(method="admm", x0=init, rhos=rhos, lams=sigmas, max_iter=24)

    print(f"mosaiced PSNR: {metrics.psnr(b, img):.2f} dB")
    print(f"bilinear PSNR: {metrics.psnr(init, img):.2f} dB")
    print(f"solved   PSNR: {metrics.psnr(out, img):.2f} dB")


if __name__ == "__main__":
    main()
