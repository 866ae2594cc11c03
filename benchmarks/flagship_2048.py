"""Attack probe for the 2048^2 flagship-PnP cliff (VERDICT r4 #3).

Round-4 measured flagship PnP (distilled_color_tv) at 318.6 / 79.3 /
15.4 its/s over 512/1024/2048 — a 5.1x per-pixel drop at 2048^2 with no
attack attempted (the DRUNet-tiling negative closed one avenue). This
probe measures, at 2048^2 on the real TPU:

  * per-component cost of one flagship iteration: x-update (size-gated
    rfft path), the distilled FFDNet student (f32 and bf16), the TV
    branch — so the cliff is attributed, not guessed;
  * end-to-end flagship its/s with the deep branch in bf16
    (BF16Denoiser; measured +21% at 512^2 where the nc=96 net is
    compute-bound);
  * quality guard: PSNR of a 24-it 2048^2 deconv solve, f32 vs bf16
    deep branch, on the tiled-face image.

    python benchmarks/flagship_2048.py [--size 2048] [--quick]
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
from dprox_tpu.utils import imaging, metrics


def tile_image(H, W):
    img = np.asarray(imaging.sample("face"))
    reps = (H + img.shape[2] - 1) // img.shape[2], \
           (W + img.shape[3] - 1) // img.shape[3]
    big = np.tile(img, (1, 1) + reps)[:, :, :H, :W]
    return jnp.asarray(big)


def sustained(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.mean(jnp.abs(out)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.mean(jnp.abs(out)))
        best = min(best, time.perf_counter() - t0)
    return best


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


def components(H):
    from dprox_tpu.proxfn.pnp.denoisers import BF16Denoiser, TVDenoiser
    from dprox_tpu.proxfn.pnp.prior import get_denoiser

    x = tile_image(H, H)
    row = {}

    deep = get_denoiser("distilled_color")
    call = jax.jit(lambda im: deep.denoise(im, 0.05))
    row["deep_f32_ms"] = round(sustained(call, x) * 1e3, 2)

    deep16 = BF16Denoiser(get_denoiser("distilled_color"))
    call16 = jax.jit(lambda im: deep16.denoise(im, 0.05))
    row["deep_bf16_ms"] = round(sustained(call16, x) * 1e3, 2)

    tv = TVDenoiser()
    calltv = jax.jit(lambda im: tv.denoise(im, 0.05))
    row["tv_ms"] = round(sustained(calltv, x) * 1e3, 2)

    # x-update via the compiled deconv least-squares (rfft-gated path)
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(x, psf)
    var = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(var, psf) - b),
                         dp.nonneg(var)], method="admm")
    its = _marginal_its(
        lambda n: solver.solve(x0=b, max_iter=n, rhos=0.05, lams=0.01),
        24, 124)
    row["deconv_fft_its_per_sec"] = round(its, 1)
    row["xupdate_ms_approx"] = round(1e3 / its, 2)
    return row


def flagship(H, bf16: bool, spans=(8, 48)):
    from dprox_tpu.proxfn.pnp.denoisers import BF16Denoiser, DeepTVDenoiser
    from dprox_tpu.proxfn.pnp.prior import get_denoiser

    img = tile_image(H, H)
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    deep = get_denoiser("distilled_color")
    if bf16:
        deep = BF16Denoiser(deep)
    prior = DeepTVDenoiser(deep, weight=0.6)
    x = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                         dp.deep_prior(x, prior)], "admm")
    rhos, sigmas = dp.log_descent(80, 25, spans[1])
    its = _marginal_its(
        lambda n: solver.solve(x0=b, max_iter=n, rhos=rhos[:n],
                               lams=sigmas[:n]), *spans)
    # quality guard at 24 iters
    out = solver.solve(x0=b, max_iter=24, rhos=rhos[:24], lams=sigmas[:24])
    psnr = round(float(metrics.psnr(out, img)), 3)
    return {"its_per_sec": round(its, 1), "psnr24": psnr}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--quick", action="store_true",
                    help="components only")
    a = ap.parse_args()
    H = a.size
    report = {"device": str(jax.devices()[0]), "size": H}
    report["components"] = components(H)
    print(json.dumps(report), flush=True)
    if not a.quick:
        report["flagship_f32"] = flagship(H, bf16=False)
        print(json.dumps(report), flush=True)
        report["flagship_bf16"] = flagship(H, bf16=True)
        print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
