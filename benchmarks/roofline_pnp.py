"""Speed-of-light accounting for the PnP deep-prior path (VERDICT r1
weak #3): analytic FLOPs/bytes for the shipped denoisers at the bench
shape, sustained measured throughput for (a) the denoiser alone and
(b) the full PnP-ADMM iteration, and the achieved fraction of the v5e
compute/bandwidth bounds.

v5e (lite0) peaks used: 197 TFLOP/s bf16 MXU, ~49 TFLOP/s for f32
operands (bf16x6 passes), 819 GB/s HBM. MXU lane-utilization ceiling for
a KxN implicit-GEMM conv: ceil-padding K and N to 128 wastes
(1 - K*N / (ceil(K/128)*128 * ceil(N/128)*128)) of the array.

Run on the real TPU: python benchmarks/roofline_pnp.py
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12
PEAK_F32 = 49e12   # f32 operands: MXU runs bf16x6 passes
HBM_BPS = 819e9


def ffdnet_flops_bytes(H, W, in_nc, nc, nb, dtype_bytes=4):
    """Analytic conv FLOPs and HBM activation traffic per call.

    Pixel-unshuffle sf=2: the stack runs at (H/2, W/2) on 4*in_nc (+1
    sigma-map) channels.
    """
    h, w = H // 2, W // 2
    cin0 = 4 * in_nc + 1
    cout_last = 4 * in_nc
    layers = [(cin0, nc)] + [(nc, nc)] * (nb - 2) + [(nc, cout_last)]
    flops = sum(2 * 9 * h * w * ci * co for ci, co in layers)
    # each layer reads its input and writes its output once (XLA fuses
    # the relu; weights are negligible at these sizes)
    bytes_ = sum(h * w * (ci + co) * dtype_bytes for ci, co in layers)
    bytes_ += 2 * H * W * in_nc * dtype_bytes  # un/shuffle in+out
    # MXU ceiling: K=9*cin x N=cout GEMM tiles padded to 128
    util = []
    for ci, co in layers:
        K, N = 9 * ci, co
        Kp = math.ceil(K / 128) * 128
        Np = math.ceil(N / 128) * 128
        util.append((K * N) / (Kp * Np))
    mxu_util_cap = sum(2 * 9 * h * w * ci * co for ci, co in layers) / sum(
        2 * 9 * h * w * ci * co / u for (ci, co), u in zip(layers, util))
    return flops, bytes_, mxu_util_cap


def sustained(fn, x, lo=8, hi=64, reps=3):
    """Marginal calls/s: scan-chained applications, differenced to cancel
    the relay's fixed dispatch overhead (bench.py methodology)."""
    def chain(n):
        def run(v):
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, v, None, length=n)
            return out
        return jax.jit(run, static_argnums=())

    fns = {n: chain(n) for n in (lo, hi)}

    def timed(n):
        f = fns[n]
        float(jnp.mean(jnp.abs(f(x))))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.mean(jnp.abs(f(x))))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(lo), timed(hi)
    return (hi - lo) / max(t_hi - t_lo, 1e-9)


def main():
    import dprox_tpu as dp
    from dprox_tpu.proxfn.pnp.prior import get_denoiser
    from dprox_tpu.utils import imaging

    H = W = 512
    img = imaging.sample("face")[:, :, :H, :W]
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)

    report = {"metric": "pnp_deep_prior_roofline", "shape": f"{H}x{W}x3",
              "device": str(jax.devices()[0])}

    for name, nc, nb in (("tiny_ffdnet_color", 32, 8),
                         ("res_ffdnet_color", 96, 10)):
        den = get_denoiser(name)
        flops, bytes_, mxu_cap = ffdnet_flops_bytes(H, W, 3, nc, nb)
        calls = sustained(lambda v: den.denoise(v, 0.1), jnp.asarray(b))
        tflops = calls * flops / 1e12
        report[name] = {
            "gflop_per_call": round(flops / 1e9, 2),
            "act_mb_per_call": round(bytes_ / 1e6, 1),
            "denoiser_calls_per_s": round(calls, 1),
            "achieved_tflops_f32": round(tflops, 2),
            "frac_of_f32_peak": round(tflops * 1e12 / PEAK_F32, 3),
            "frac_of_lane_adjusted_f32_peak": round(
                tflops * 1e12 / (PEAK_F32 * mxu_cap), 3),
            "mxu_lane_util_cap": round(mxu_cap, 3),
            "frac_of_hbm_bound": round(calls * bytes_ / HBM_BPS, 3),
            "compute_bound_calls_per_s": round(PEAK_F32 * mxu_cap / flops, 1),
            "hbm_bound_calls_per_s": round(HBM_BPS / bytes_, 1),
        }

    # full PnP iteration for context (suite.py pnp_deep number)
    x = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                         dp.deep_prior(x, "tiny_ffdnet_color", sqrt=True)],
                        "admm")
    rhos, sigmas = dp.log_descent(35, 10, 124)

    def timed(n):
        out = solver.solve(x0=b, max_iter=n, rhos=rhos[:n], lams=sigmas[:n])
        float(jnp.mean(jnp.abs(out)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = solver.solve(x0=b, max_iter=n, rhos=rhos[:n],
                               lams=sigmas[:n])
            float(jnp.mean(jnp.abs(out)))
            best = min(best, time.perf_counter() - t0)
        return best

    t8, t48 = timed(8), timed(48)
    report["pnp_iteration_per_s"] = round(40 / max(t48 - t8, 1e-9), 1)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
