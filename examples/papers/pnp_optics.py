"""PnP restoration through a (fixed) diffractive-optics forward model.

Counterpart of /root/reference/examples/papers/deltaprox_siggraph_2023/
computional_optics/pnp_optics.py: build the DOE model, take the
baseline Fresnel-lens phase profile, simulate its PSF, degrade an image
through it (+ sensor noise sigma=7.65/255), then restore with PnP-ADMM
using a conv_doe data term whose PSF arrives through a Placeholder.
Offline-safe: deep prior defaults to TV (the strongest offline prior),
switchable to the shipped tiny FFDNet.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import jax
import numpy as np

import dprox_tpu as dp
from dprox_tpu.contrib.optic import (DOEModelConfig, build_baseline_profile,
                                     build_doe_model, img_psf_conv)
from dprox_tpu.utils import imaging, metrics


def main(patch: int = 128, denoiser: str = "tv", max_iter: int = 10):
    config = DOEModelConfig(
        patch_size=patch, wave_resolution=(patch * 2, patch * 2),
        sample_interval=2e-6 * 1496 / (patch * 2))
    model = build_doe_model(config)
    # fixed optic: ideal Fresnel-lens phase at the center wavelength
    # (reference: build_baseline_profile, contrib/optic/doe_model.py)
    fresnel_profile = build_baseline_profile(model)
    psf = model.get_psf(phase_profile=fresnel_profile)

    x = dp.Variable()
    y = dp.Placeholder("y")
    psf_ph = dp.Placeholder("psf")
    data_term = dp.sum_squares(dp.conv_doe(x, psf_ph, circular=config.circular), b=y)
    reg_term = dp.deep_prior(x, denoiser=denoiser)
    solver = dp.compile(data_term + reg_term, method="admm")

    sigma = 7.65 / 255
    rhos, sigmas = dp.log_descent(49, 7.65, max_iter, sigma=max(0.255 / 255, sigma))

    gt = imaging.sample("face")[:, :, :patch, :patch]
    inp = img_psf_conv(gt, psf, circular=config.circular)
    inp = inp + sigma * jax.random.normal(jax.random.key(0), inp.shape)

    out = solver.solve(x0=inp, rhos=rhos, lams=sigmas, max_iter=max_iter,
                       params={"psf": psf, "y": inp})
    out = np.clip(np.asarray(out), 0, 1)
    print(f"prior={denoiser}")
    print(f"input  PSNR {metrics.psnr(inp, gt):.2f} dB  "
          f"SSIM {metrics.ssim(inp, gt):.4f}")
    print(f"output PSNR {metrics.psnr(out, gt):.2f} dB  "
          f"SSIM {metrics.ssim(out, gt):.4f}")


if __name__ == "__main__":
    main()
