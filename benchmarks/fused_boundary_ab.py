"""A/B the FFDNet boundary-fused forward (models/ffdnet.py::fused_apply)
against the plain module.apply path, and its end-to-end effect on the
flagship PnP solve (VERDICT r4 #3 follow-on).

Background (probed on v5e, r5): the denoiser's pixel-(un)shuffle 6-D
transposes compile to layout-change copies whose tiny minor dims (3,2,2)
hit a pathological TPU copy emitter — HLO cost attribution shows 2x
9.6 ms for 25 MB each at 2048^2, ~half the denoiser call. The fused path
absorbs space-to-depth into a 6x6 stride-2 first conv (exact weight
rearrangement) and depth-to-space into 4 interior-padded phase adds.
Negatives also probed this session (recorded in weights/README):
NCHW-native chain 4.6x slower, lhs-dilated transposed conv +27 ms,
strided-slice gather s2d +14 ms, strided .at[].set scatter 5x slower,
pow2-lane padding of the boundary tensors -5% only.

    python benchmarks/fused_boundary_ab.py [--quality]

One JSON line per row.
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


def marginal_ms(run, args, lo=2, hi=12):
    def timed(n):
        out = run(*args, n)
        float(jnp.mean(jnp.abs(out)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(*args, n)
            float(jnp.mean(jnp.abs(out)))
            best = min(best, time.perf_counter() - t0)
        return best
    t_lo, t_hi = timed(lo), timed(hi)
    return (t_hi - t_lo) / (hi - lo) * 1e3


def denoiser_ab():
    from functools import partial

    from dprox_tpu.models.ffdnet import fused_apply
    from dprox_tpu.proxfn.pnp.prior import get_denoiser

    den = get_denoiser("distilled_color")
    mod, params = den.module, den.params

    def scanify(apply):
        @partial(jax.jit, static_argnums=1)
        def run(x, n):
            def body(c, _):
                return apply(c) * 0.5 + c * 0.5, ()
            c, _ = jax.lax.scan(body, x, (), length=n)
            return c
        return run

    plain = scanify(lambda c: mod.apply(params, c, 0.05))
    fused = scanify(lambda c: fused_apply(mod, params, c, jnp.asarray(0.05)))
    for H, lo, hi in [(512, 4, 44), (1024, 2, 22), (2048, 2, 12)]:
        x = jax.random.uniform(jax.random.key(1), (1, H, H, 3), jnp.float32)
        mp = marginal_ms(plain, (x,), lo, hi)
        mf = marginal_ms(fused, (x,), lo, hi)
        print(json.dumps({"row": f"denoiser_{H}", "plain_ms": round(mp, 3),
                          "fused_ms": round(mf, 3),
                          "speedup": round(mp / mf, 2)}), flush=True)


def flagship_e2e(H):
    import dprox_tpu as dp
    from dprox_tpu.utils import imaging

    img = np.asarray(imaging.sample("face"))
    reps = (H + img.shape[2] - 1) // img.shape[2]
    b_img = jnp.asarray(np.tile(img, (1, 1, reps, reps))[:, :, :H, :H])
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(b_img, psf)
    x = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                         dp.deep_prior(x, "distilled_color_tv")], "admm")
    rhos, sigmas = dp.log_descent(80, 30, 48)

    def run(n):
        return solver.solve(x0=b, max_iter=n, rhos=rhos[:n], lams=sigmas[:n])

    def timed(n):
        out = run(n)
        float(jnp.mean(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(n)
            float(jnp.mean(out))
            best = min(best, time.perf_counter() - t0)
        return best
    lo, hi = (8, 48) if H <= 1024 else (4, 24)
    t_lo, t_hi = timed(lo), timed(hi)
    its = (hi - lo) / max(t_hi - t_lo, 1e-9)
    print(json.dumps({"row": f"flagship_pnp_{H}",
                      "fused": os.environ.get("DPROX_FFDNET_FUSED", "auto"),
                      "its_per_sec": round(its, 1)}), flush=True)


def quality(H=512):
    """Hopper deconv PSNR, fused vs plain (expect parity to ~0.01 dB)."""
    import dprox_tpu as dp
    from dprox_tpu.utils import imaging, metrics

    img = imaging.sample("hopper")[:, :, :H, :H]
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    rhos, sigmas = dp.log_descent(80, 30, 24)
    for flag in ("0", "1"):
        os.environ["DPROX_FFDNET_FUSED"] = flag
        # fresh solver per flag: the fused/plain choice is baked in at
        # trace time, so a shared jit cache would defeat the A/B
        x = dp.Variable()
        solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                             dp.deep_prior(x, "distilled_color_tv")], "admm")
        out = solver.solve(x0=b, max_iter=24, rhos=rhos, lams=sigmas)
        p = metrics.psnr(np.asarray(out), np.asarray(img))
        print(json.dumps({"row": f"quality_fused_{flag}",
                          "psnr_db": round(float(p), 3)}), flush=True)
    os.environ.pop("DPROX_FFDNET_FUSED", None)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", action="store_true")
    ap.add_argument("--sizes", default="512,2048")
    args = ap.parse_args()
    denoiser_ab()
    for H in [int(s) for s in args.sizes.split(",") if s]:
        flagship_e2e(H)
    if args.quality:
        quality()
