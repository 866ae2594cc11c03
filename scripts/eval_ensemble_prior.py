"""Two-net ensemble prior eval: does averaging the shipped FFDNet and
DRUNet before the TV fusion beat either alone? (zero-training quality
candidate; run on the real TPU)

    python scripts/eval_ensemble_prior.py [--x8] [--w-deep 0.5 ...]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

import dprox_tpu as dp
from dprox_tpu.proxfn.pnp.denoisers import (DeepTVDenoiser, EnsembleDenoiser)
from dprox_tpu.proxfn.pnp.prior import get_denoiser
from dprox_tpu.utils import imaging, metrics

from eval_candidate_prior import deconv, grace_hopper


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--x8", action="store_true")
    ap.add_argument("--w-deep", type=float, nargs="*", default=[0.5])
    ap.add_argument("--w-tv", type=float, default=0.5)
    args = ap.parse_args()

    ffd = get_denoiser("res_ffdnet_color")
    dru = get_denoiser("tiny_drunet_color")

    def prior(fn_den):
        def make(x):
            return dp.deep_prior(x, fn_den, x8=args.x8)
        return make

    configs = {}
    for wd in args.w_deep:
        ens = EnsembleDenoiser([ffd, dru], [wd, 1 - wd])
        configs[f"ens(w_ffd={wd})_tv"] = prior(
            DeepTVDenoiser(ens, weight=args.w_tv))
    configs["ffdnet_tv (baseline)"] = prior(DeepTVDenoiser(ffd, weight=0.5))
    configs["drunet_tv (baseline)"] = prior(DeepTVDenoiser(dru, weight=0.5))

    evals = {"hopper": grace_hopper(),
             "face": np.asarray(imaging.sample("face"))}
    for ename, img in evals.items():
        for pname, fn in configs.items():
            inp, out = deconv(img, fn)
            print(f"{ename:8s} {pname:24s} x8={args.x8} "
                  f"{inp:6.2f} -> {out:6.2f} dB", flush=True)


if __name__ == "__main__":
    main()
