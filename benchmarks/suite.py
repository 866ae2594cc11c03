"""Throughput suite across the four solver execution paths.

One JSON line with marginal iterations/s on the real TPU for:
  - deconv_fft:   FFT-diagonal x-update + pointwise prox (the bench.py
                  headline, 512x512x3)
  - pnp_deep:     same problem with the shipped tiny FFDNet color deep
                  prior (CNN inference inside the scan)
  - csmri_fast:   fused k-space fast prox (complex state, 256x256)
  - joint_dd_cg:  non-diagonalizable joint demosaic+deconv, matrix-free
                  CG x-update (40 inner CG iters, 256x256x3)

Marginal rate methodology as in bench.py: host-fetch forced, fixed
overhead cancelled by differencing two iteration counts.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp


def marginal_its(solve, lo=8, hi=48, reps=3):
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


def main():
    import dprox_tpu as dp
    from dprox_tpu.contrib import csmri
    from dprox_tpu.utils import imaging

    results = {}

    # deconv FFT path
    img = imaging.sample("face")[:, :, :512, :512]
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b), dp.nonneg(x)],
                        "admm")
    results["deconv_fft"] = marginal_its(
        lambda n: solver.solve(x0=b, max_iter=n, rhos=0.05, lams=0.01),
        lo=24, hi=124)

    # PnP deep prior
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                         dp.deep_prior(x, "tiny_ffdnet_color", sqrt=True)],
                        "admm")
    rhos, sigmas = dp.log_descent(35, 10, 124)
    results["pnp_deep"] = marginal_its(
        lambda n: solver.solve(x0=b, max_iter=n, rhos=rhos[:n],
                               lams=sigmas[:n]), lo=8, hi=48)

    # PnP flagship: the SAME config whose PSNR the README advertises
    # (distilled single-net student of the x8 ensemble; VERDICT r2 #1)
    from dprox_tpu.proxfn.pnp.hub import find_weights
    flagship = ("distilled_color_tv"
                if find_weights("distilled_ffdnet_color.msgpack")
                else "res_ffdnet_color_tv")
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                         dp.deep_prior(x, flagship)], "admm")
    rhos_f, sig_f = dp.log_descent(80, 30, 48)
    results[f"pnp_flagship[{flagship}]"] = marginal_its(
        lambda n: solver.solve(x0=b, max_iter=n, rhos=rhos_f[:n],
                               lams=sig_f[:n]), lo=8, hi=48)

    # CSMRI fused k-space prox (complex state)
    s = csmri.generate_sample(size=256, num_lines=60)
    xm = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    solver = dp.compile(dp.csmri(xm, mask, y) + dp.deep_prior(xm, "tv",
                                                              sqrt=True),
                        "admm")
    # wide span: per-iter cost at 256^2 is ~75us — a 40-iteration span
    # is below the relay's call jitter (r2's 1737 its/s was noise)
    rhos_c, sig_c = dp.log_descent(30, 5, 448, sigma=0.01)
    results["csmri_fast"] = marginal_its(
        lambda n: solver.solve(x0=s["x0"], max_iter=n, rhos=rhos_c[:n],
                               lams=sig_c[:n], params=s["params"],
                               real_output=True), lo=48, hi=448)

    # joint demosaic+deconv, CG x-update
    img2 = imaging.sample("face")[:, :, :256, :256]
    psf2 = imaging.point_spread_function(9, 2)
    b2 = imaging.mosaicing(imaging.blurring(img2, psf2))
    x2 = dp.Variable()
    data = dp.sum_squares(dp.mosaic(dp.conv(x2, psf2)) - dp.Placeholder("b"))
    solver = dp.compile(data + dp.deep_prior(x2, "tv"), "admm",
                        linear_solve_config=dp.LinearSolveConfig(max_iters=40))
    init = dp.utils.demosaic_from_mosaiced(b2)
    # 60-iteration span: the 12-iteration span showed +/-30% relay
    # jitter (see bench.py R2_FLOORS note)
    rhos_j, sig_j = dp.log_descent(35, 10, 64)
    results["joint_dd_cg"] = marginal_its(
        lambda n: solver.solve(x0=init, max_iter=n, rhos=rhos_j[:n],
                               lams=sig_j[:n], params={"b": b2}),
        lo=4, hi=64)

    print(json.dumps({
        "metric": "solver_paths_iterations_per_sec",
        "by_path": {k: round(v, 1) for k, v in results.items()},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
