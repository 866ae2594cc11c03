"""Head-to-head: the width-128 distilled student vs the shipped nc=96
``distilled_color`` flagship, at the flagship's own pinned config
(deconv psf 15/5, log_descent(80, 25, 24), DeepTV fusion) on the two
held-out evals (grace_hopper photo + synthetic face).

    python scripts/eval_128_student.py /tmp/distill128/distilled128_color.msgpack
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

import dprox_tpu as dp
from dprox_tpu.proxfn.pnp.denoisers import DeepTVDenoiser, FFDNetColorDenoiser
from dprox_tpu.proxfn.pnp.prior import get_denoiser
from dprox_tpu.utils import imaging, metrics

from eval_candidate_prior import grace_hopper


def deconv_psnr(img, prior, sched=(80, 25)):
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                         dp.deep_prior(x, prior)], "admm")
    rhos, sigmas = dp.log_descent(sched[0], sched[1], 24)
    out = solver.solve(x0=b, rhos=rhos, lams=sigmas, max_iter=24)
    return float(metrics.psnr(out, img))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--nc", type=int, default=128)
    args = ap.parse_args()

    cand = FFDNetColorDenoiser(ckpt_path=args.ckpt, nc=args.nc, nb=10,
                               residual=True)
    priors = {
        "distilled96_tv_w0.6": DeepTVDenoiser(get_denoiser("distilled_color"),
                                              weight=0.6),
        "cand128_tv_w0.6": DeepTVDenoiser(cand, weight=0.6),
        "cand128_tv_w0.5": DeepTVDenoiser(cand, weight=0.5),
        "cand128_tv_w0.7": DeepTVDenoiser(cand, weight=0.7),
    }
    evals = {"hopper": grace_hopper(),
             "face": np.asarray(imaging.sample("face"))[:, :, :512, :512]}
    for ename, img in evals.items():
        for pname, prior in priors.items():
            p = deconv_psnr(img, prior)
            print(f"{ename:8s} {pname:22s} {p:6.2f} dB", flush=True)


if __name__ == "__main__":
    main()
