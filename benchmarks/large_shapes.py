"""Large-shape perf study: 1024^2 / 2048^2 (VERDICT r3 next #6).

Measures, in the VMEM-pressure regime the <=512^2 rows never reach:

  * deconv-FFT ADMM marginal its/s at 1024^2 and 2048^2;
  * flagship PnP (distilled_color_tv) its/s at 1024^2;
  * DRUNet inference A/B: whole-image vs refield quadrant tiling
    (the reference's wrapper.py:112-146 pattern) at 1024^2 / 2048^2.

    python benchmarks/large_shapes.py            (real TPU)
    python benchmarks/large_shapes.py --quick    (skip 2048^2)

Each row prints one JSON line; conclusions are recorded in
weights/README.md findings + COVERAGE.md.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.utils import imaging


def _marginal_its(solve, lo, hi, reps=3):
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


def tile_image(H, W):
    img = np.asarray(imaging.sample("face"))  # [1, 3, h, w]
    reps = (H + img.shape[2] - 1) // img.shape[2], \
           (W + img.shape[3] - 1) // img.shape[3]
    big = np.tile(img, (1, 1) + reps)[:, :, :H, :W]
    return jnp.asarray(big)


def deconv_fft_row(H, spans=(24, 224)):
    img = tile_image(H, H)
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                         dp.nonneg(x)], method="admm")
    its = _marginal_its(
        lambda n: solver.solve(x0=b, max_iter=n, rhos=0.05, lams=0.01),
        *spans)
    print(json.dumps({"row": f"deconv_fft_{H}", "its_per_sec": round(its, 1),
                      "span": f"{spans[0]}-{spans[1]}"}), flush=True)


def pnp_flagship_row(H, spans=(8, 48)):
    img = tile_image(H, H)
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                         dp.deep_prior(x, "distilled_color_tv")], "admm")
    rhos, sigmas = dp.log_descent(80, 25, spans[1])
    its = _marginal_its(
        lambda n: solver.solve(x0=b, max_iter=n, rhos=rhos[:n],
                               lams=sigmas[:n]), *spans)
    print(json.dumps({"row": f"pnp_flagship_{H}", "its_per_sec": round(its, 1),
                      "span": f"{spans[0]}-{spans[1]}"}), flush=True)


def drunet_ab_row(H, reps=5):
    """Whole-image vs quadrant-tiled DRUNet inference at [1,3,H,H]."""
    from dprox_tpu.proxfn.pnp.denoisers import DRUNetDenoiser
    from dprox_tpu.proxfn.pnp.hub import find_weights

    ckpt = find_weights("tiny_drunet_color.msgpack")
    x = tile_image(H, H)
    out = {}
    for mode, min_size in (("whole", 4096), ("tiled", 256)):
        den = DRUNetDenoiser(3, ckpt_path=ckpt, nc=(32, 64, 128, 256),
                             nb=2, residual=True, min_size=min_size)
        call = jax.jit(lambda im, d=den: d.denoise(im, 0.1))
        try:
            float(jnp.mean(call(x)))  # compile
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(jnp.mean(call(x)))
                best = min(best, time.perf_counter() - t0)
            out[mode] = round(1.0 / best, 2)
        except Exception as e:  # OOM at large shapes is a finding
            out[mode] = f"error: {type(e).__name__}"
    print(json.dumps({"row": f"drunet_ab_{H}", "calls_per_sec": out}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    deconv_fft_row(1024)
    pnp_flagship_row(1024)
    drunet_ab_row(1024)
    if not args.quick:
        deconv_fft_row(2048, spans=(24, 124))
        drunet_ab_row(2048, reps=3)
        pnp_flagship_row(2048, spans=(4, 24))


if __name__ == "__main__":
    main()
