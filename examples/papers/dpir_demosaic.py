"""DPIR-style PnP demosaicking: HQS + x8 self-ensemble + edge-aware init
+ hard data consistency.

Counterpart of /root/reference/examples/papers/dpir_tpami_2020/
rgb_demosaic.py: edge-aware Bayer interpolation as x0 (essential there:
"wo 14, w 41.72" rgb_demosaic.py:21), HQS with a long log-descent
schedule, geometric self-ensemble (x8) around the denoiser prior, and
replacing the solution at sampled CFA locations with the measurements
after solving. Offline-safe: uses the best in-repo prior when the
reference's HF FFDNet weights are absent.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.utils import demosaic_ea, imaging, metrics
from dprox_tpu.proxfn.pnp.hub import find_weights


def main(iters=24):
    img = imaging.sample("face")
    b = imaging.mosaicing(img)
    mask = imaging.bayer_mask(img.shape[-2:])

    x0 = demosaic_ea(b)
    print(f"edge-aware init PSNR: {metrics.psnr(x0, img):.2f} dB")

    x = dp.Variable()
    data_term = dp.sum_squares(dp.mosaic(x), b=dp.utils.array(np.asarray(b)))
    denoiser = ("ffdnet_color" if find_weights("ffdnet_color.pth")
                else "res_ffdnet_color_tv")
    reg_term = dp.deep_prior(x, denoiser=denoiser, x8=True)
    solver = dp.compile([data_term, reg_term], method="hqs")

    rhos, sigmas = dp.log_descent(32, 2, iters)
    out = solver.solve(x0=x0, rhos=rhos, lams={reg_term: sigmas},
                       max_iter=iters)
    out = jnp.clip(out, 0.0, 1.0)
    print(f"HQS PnP PSNR: {metrics.psnr(out, img):.2f} dB")

    # hard data consistency at sampled CFA locations
    out = jnp.where(jnp.asarray(mask) > 0, b, out)
    print(f"+data-consistency PSNR: {metrics.psnr(out, img):.2f} dB")
    return float(metrics.psnr(out, img))


if __name__ == "__main__":
    main()
