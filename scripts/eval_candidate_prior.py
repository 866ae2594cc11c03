"""Head-to-head deconv eval: a candidate FFDNet checkpoint vs the shipped
res_ffdnet_color prior, plain and TV-fused, on the held-out photo and the
synthetic face.

    python scripts/eval_candidate_prior.py weights/cand_foo.msgpack \
        [--nc 96] [--nb 10] [--no-residual]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

import dprox_tpu as dp
from dprox_tpu.proxfn.pnp.denoisers import DeepTVDenoiser, FFDNetColorDenoiser
from dprox_tpu.utils import imaging, metrics


def grace_hopper(size=512):
    import matplotlib

    from PIL import Image

    path = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                        "sample_data", "grace_hopper.jpg")
    img = np.asarray(Image.open(path), np.float32) / 255.0
    h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    return img[top:top + size, left:left + size].transpose(2, 0, 1)[None]


def deconv(img, prior_fn, sched=(80, 30)):
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    data = dp.sum_squares(dp.conv(x, psf) - b)
    solver = dp.compile([data, prior_fn(x)], "admm")
    rhos, sigmas = dp.log_descent(sched[0], sched[1], 24)
    out = solver.solve(x0=b, rhos=rhos, lams=sigmas, max_iter=24)
    return metrics.psnr(b, img), metrics.psnr(out, img)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--nc", type=int, default=96)
    ap.add_argument("--nb", type=int, default=10)
    ap.add_argument("--no-residual", action="store_true")
    ap.add_argument("--fusion-weight", type=float, default=0.5)
    args = ap.parse_args()

    cand = FFDNetColorDenoiser(ckpt_path=args.ckpt, nc=args.nc, nb=args.nb,
                               residual=not args.no_residual)
    priors = {
        "shipped res_ffdnet_color": lambda x: dp.deep_prior(
            x, "res_ffdnet_color"),
        "shipped res_ffdnet_color_tv": lambda x: dp.deep_prior(
            x, "res_ffdnet_color_tv"),
        "candidate": lambda x: dp.deep_prior(x, cand),
        "candidate_tv": lambda x: dp.deep_prior(
            x, DeepTVDenoiser(cand, weight=args.fusion_weight)),
    }
    evals = {"hopper": grace_hopper(),
             "face": np.asarray(imaging.sample("face"))}
    for ename, img in evals.items():
        for pname, fn in priors.items():
            inp, out = deconv(img, fn)
            print(f"{ename:8s} {pname:28s} {inp:6.2f} -> {out:6.2f} dB",
                  flush=True)


if __name__ == "__main__":
    main()
