"""Compare offline priors on PnP-ADMM deconvolution.

Scores each available prior (TV, shipped tiny FFDNets, optional
candidate weight files) on two eval images:

- the deterministic synthetic "face" used across examples/bench, and
- a genuine photograph (matplotlib's grace_hopper.jpg) that is HELD OUT
  of every training corpus in scripts/train_tiny_denoiser.py,

so denoiser-prior changes can be judged on both synthetic and natural
statistics. Counterpart of the reference's example-level PSNR records
(/root/reference/examples/applications/deconv.py:15 cites ~35 dB with
the HF-pretrained FFDNet; zero-egress here, so priors are in-repo).

Usage:
    JAX_PLATFORMS=cpu python scripts/eval_prior_quality.py [candidate.msgpack ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

import dprox_tpu as dp
from dprox_tpu.utils import imaging, metrics


def grace_hopper(size: int = 512) -> np.ndarray:
    """Center crop of matplotlib's bundled grace_hopper.jpg, CHW in [0,1]."""
    import matplotlib
    from PIL import Image

    path = os.path.join(matplotlib.get_data_path(), "sample_data",
                        "grace_hopper.jpg")
    img = np.asarray(Image.open(path), np.float32) / 255.0
    h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    img = img[top:top + size, left:left + size]
    return np.transpose(img, (2, 0, 1))[None]


def solve_deconv(img, prior, sched=(35, 10), iters=24):
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    data_term = dp.sum_squares(dp.conv(x, psf) - b)
    solver = dp.compile([data_term, prior(x)], method="admm")
    rhos, sigmas = dp.log_descent(sched[0], sched[1], iters)
    out = solver.solve(x0=b, rhos=rhos, lams=sigmas, max_iter=iters)
    return metrics.psnr(b, img), metrics.psnr(out, img)


def candidate_prior(path):
    from dprox_tpu.proxfn.pnp.denoisers import FFDNetColorDenoiser

    return FFDNetColorDenoiser(ckpt_path=path, nc=32, nb=8)


def main(candidates):
    evals = {
        "synthetic_face": np.asarray(imaging.sample("face")),
        "grace_hopper": grace_hopper(),
    }
    # each shipped prior at its documented best config (weights/README.md)
    priors = {
        "tv": (lambda x: dp.deep_prior(x, denoiser="tv"), (35, 10)),
        "tiny_ffdnet_color": (lambda x: dp.deep_prior(
            x, denoiser="tiny_ffdnet_color", sqrt=True), (60, 20)),
        "res_ffdnet_color": (lambda x: dp.deep_prior(
            x, denoiser="res_ffdnet_color"), (80, 30)),
        "res_ffdnet_color_tv": (lambda x: dp.deep_prior(
            x, denoiser="res_ffdnet_color_tv"), (80, 30)),
    }
    for path in candidates:
        den = candidate_prior(path)
        name = os.path.splitext(os.path.basename(path))[0]
        priors[f"cand:{name}"] = (
            lambda x, d=den: dp.deep_prior(x, denoiser=d, sqrt=True),
            (60, 20))

    for ename, img in evals.items():
        for pname, (prior, sched) in priors.items():
            try:
                inp, out = solve_deconv(img, prior, sched)
                print(f"{ename:16s} {pname:24s} input {inp:6.2f} dB  "
                      f"output {out:6.2f} dB", flush=True)
            except Exception as e:  # keep the sweep going
                print(f"{ename:16s} {pname:24s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
