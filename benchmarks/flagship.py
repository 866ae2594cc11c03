"""Throughput of the QUALITY-flagship PnP config (publish next to its dB).

Measures marginal PnP-ADMM iterations/s at 512x512x3 deconv on the real
TPU for the priors whose PSNR the README advertises, so the advertised
quality and the advertised speed are the same configuration:

  - ensemble_tv + x8  (35.37 dB held-out hopper; ~16 CNN calls + TV/prox)
  - distilled_color_tv (single-net student distilled from the above)
  - res_ffdnet_color_tv (single-net fusion baseline)

Usage: python benchmarks/flagship.py [key ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.utils import imaging


def marginal_its(solve, lo, hi, reps=3):
    def timed(iters):
        out = solve(iters)
        float(jnp.mean(jnp.abs(out)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = solve(iters)
            float(jnp.mean(jnp.abs(out)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(lo), timed(hi)
    return (hi - lo) / max(t_hi - t_lo, 1e-9)


def measure(key, x8: bool, lo=4, hi=12):
    if callable(key):
        key = key()
    img = imaging.sample("face")[:, :, :512, :512]
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                         dp.deep_prior(x, key, x8=x8)], "admm")
    rhos, sigmas = dp.log_descent(80, 30, max(hi, 24))
    return marginal_its(
        lambda n: solver.solve(x0=b, max_iter=n, rhos=rhos[:n],
                               lams=sigmas[:n]), lo, hi)


def _bf16_distilled():
    from dprox_tpu.proxfn.pnp.denoisers import BF16Denoiser, DeepTVDenoiser
    from dprox_tpu.proxfn.pnp.prior import get_denoiser

    return DeepTVDenoiser(BF16Denoiser(get_denoiser("distilled_color")),
                          weight=0.5)


CONFIGS = {
    "ensemble_tv_x8": ("ensemble_tv", True),
    "res_ffdnet_color_tv": ("res_ffdnet_color_tv", False),
    "distilled_color_tv": ("distilled_color_tv", False),
    "distilled_color_tv_bf16": (_bf16_distilled, False),
}


def main():
    want = sys.argv[1:] or list(CONFIGS)
    out = {"metric": "flagship_pnp_iterations_per_sec_512x512_deconv",
           "unit": "iters/s", "device": str(jax.devices()[0]), "by_config": {}}
    for name in want:
        key, x8 = CONFIGS[name]
        try:
            out["by_config"][name] = round(measure(key, x8), 2)
        except FileNotFoundError as e:  # weights not shipped yet
            out["by_config"][name] = f"unavailable: {e}"
        print(f"{name}: {out['by_config'][name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
