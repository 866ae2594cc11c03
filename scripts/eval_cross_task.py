"""Cross-task prior study: one prior, every example application.

Reproduces the weights/README.md study table — PnP-ADMM with the given
color/gray priors on deconvolution (hopper + synthetic face, color and
gray), CSMRI, SISR, joint demosaic-deconv (CG path), and demosaicking.
Usage:

    JAX_PLATFORMS=cpu python scripts/eval_cross_task.py \
        [--prior res_ffdnet_color_tv] [--gray-prior res_ffdnet_tv] [--x8]

Schedules are each task's measured best from weights/README.md.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.utils import imaging, metrics, demosaic_from_mosaiced


def grace_hopper(size: int = 512) -> np.ndarray:
    import matplotlib
    from PIL import Image

    path = os.path.join(matplotlib.get_data_path(), "sample_data",
                        "grace_hopper.jpg")
    img = np.asarray(Image.open(path), np.float32) / 255.0
    h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    img = img[top:top + size, left:left + size]
    return np.transpose(img, (2, 0, 1))[None]


def deconv(img, prior_fn, sched, iters=24):
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b), prior_fn(x)],
                        "admm")
    rhos, sigmas = dp.log_descent(sched[0], sched[1], iters)
    out = solver.solve(x0=b, rhos=rhos, lams=sigmas, max_iter=iters)
    return metrics.psnr(b, img), metrics.psnr(out, img)


def run_csmri(prior_fn, sched=(60, 15)):
    from dprox_tpu.contrib import csmri

    s = csmri.sample()
    x = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    solver = dp.compile(dp.csmri(x, mask, y) + prior_fn(x), method="admm")
    rhos, sigmas = dp.log_descent(sched[0], sched[1], 24, sigma=0.01)
    out = solver.solve(x0=s["x0"], rhos=rhos, lams=sigmas, max_iter=24,
                       params=s["params"], real_output=True)
    return (metrics.psnr(np.real(s["x0"]), s["gt"]),
            metrics.psnr(np.asarray(out), s["gt"]))


def run_sisr(img, prior_fn, sched=(60, 20)):
    sf = 2
    psf = imaging.point_spread_function(15, 2)
    y, x0 = imaging.downsampling(img, psf, sf)
    x = dp.Variable()
    kernel = np.transpose(psf, (2, 0, 1))[None]
    data_term = dp.sisr(x, dp.utils.array(np.asarray(y)),
                        dp.utils.array(kernel), sf)
    solver = dp.compile([data_term, prior_fn(x)], "admm")
    rhos, sigmas = dp.log_descent(sched[0], sched[1], 24)
    out = solver.solve(x0=x0, rhos=rhos, lams=sigmas, max_iter=24)
    return metrics.psnr(x0, img), metrics.psnr(out, img)


def run_joint(img, prior_fn, sched=(80, 30)):
    psf = imaging.point_spread_function(15, 3)
    b = imaging.mosaicing(imaging.blurring(img, psf))
    x = dp.Variable()
    data_term = dp.sum_squares(dp.mosaic(dp.conv(x, psf)) - b)
    solver = dp.compile([data_term, prior_fn(x)], "admm",
                        linear_solve_config=dp.LinearSolveConfig(max_iters=50))
    init = demosaic_from_mosaiced(b)
    rhos, sigmas = dp.log_descent(sched[0], sched[1], 5)
    out = solver.solve(x0=init, rhos=rhos, lams=sigmas, max_iter=5)
    return metrics.psnr(b, img), metrics.psnr(out, img)


def run_demosaic(img, prior_fn, sched=(15, 3)):
    b = imaging.mosaicing(img)
    x = dp.Variable()
    data_term = dp.sum_squares(dp.mosaic(x), b=dp.utils.array(np.asarray(b)))
    solver = dp.compile([data_term, prior_fn(x)], "admm")
    init = demosaic_from_mosaiced(b)
    rhos, sigmas = dp.log_descent(sched[0], sched[1], 24)
    out = solver.solve(x0=init, rhos=rhos, lams=sigmas, max_iter=24)
    return metrics.psnr(init, img), metrics.psnr(out, img)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prior", default="res_ffdnet_color_tv")
    ap.add_argument("--gray-prior", default="res_ffdnet_tv")
    ap.add_argument("--x8", action="store_true")
    args = ap.parse_args()

    color = lambda x: dp.deep_prior(x, denoiser=args.prior, x8=args.x8)
    color_sqrt = lambda x: dp.deep_prior(x, denoiser=args.prior, x8=args.x8,
                                         sqrt=True)
    gray_sqrt = lambda x: dp.deep_prior(x, denoiser=args.gray_prior,
                                        x8=args.x8, sqrt=True)
    gray = lambda x: dp.deep_prior(x, denoiser=args.gray_prior, x8=args.x8)

    hopper = grace_hopper()
    face = np.asarray(imaging.sample("face"))
    rows = [
        ("deconv hopper 512^2 (80,30)",
         lambda: deconv(hopper, color, (80, 30))),
        ("deconv face (80,30)", lambda: deconv(face, color, (80, 30))),
        ("deconv gray hopper (80,30)",
         lambda: deconv(hopper.mean(1, keepdims=True), gray, (80, 30))),
        ("csmri radial phantom (60,15) sqrt",
         lambda: run_csmri(gray_sqrt)),
        ("sisr x2 hopper (60,20)", lambda: run_sisr(hopper, color)),
        ("joint demosaic-deconv face CG 5it (80,30)",
         lambda: run_joint(face, color)),
        ("demosaic face (15,3)", lambda: run_demosaic(face, color)),
    ]
    print(f"prior={args.prior} gray={args.gray_prior} x8={args.x8}")
    for name, fn in rows:
        try:
            inp, out = fn()
            print(f"{name:44s} {inp:6.2f} -> {out:6.2f} dB", flush=True)
        except Exception as e:
            print(f"{name:44s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
