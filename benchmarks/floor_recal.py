"""Floor recalibration runs (VERDICT r4 #1/#6).

Re-measures the bench.py paths repeatedly with the exact harness
bench.py uses, printing every observation so floors can be derived from
a stated statistic instead of ad-hoc tightening.

    python benchmarks/floor_recal.py --path joint_dd_cg --n 5
    python benchmarks/floor_recal.py --path csmri_fast --n 5
    python benchmarks/floor_recal.py --path deconv_fft --n 3
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


def joint_dd_cg(span=(4, 64)):
    import bench
    import dprox_tpu as dp
    from dprox_tpu.utils import imaging

    img2 = imaging.sample("face")[:, :, :256, :256]
    psf2 = imaging.point_spread_function(9, 2)
    b2 = imaging.mosaicing(imaging.blurring(img2, psf2))
    x2 = dp.Variable()
    data = dp.sum_squares(dp.mosaic(dp.conv(x2, psf2)) - dp.Placeholder("b"))
    solver = dp.compile(
        data + dp.deep_prior(x2, "tv"), "admm",
        linear_solve_config=dp.LinearSolveConfig(max_iters=40))
    init = dp.utils.demosaic_from_mosaiced(b2)
    rhos_j, sig_j = dp.log_descent(35, 10, span[1])
    return lambda: bench._marginal_its(
        lambda n: solver.solve(x0=init, max_iter=n, rhos=rhos_j[:n],
                               lams=sig_j[:n], params={"b": b2}), *span)


def csmri_fast(span=(48, 448)):
    import bench
    import dprox_tpu as dp
    from dprox_tpu.contrib import csmri

    s = csmri.generate_sample(size=256, num_lines=60)
    xm = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    solver = dp.compile(dp.csmri(xm, mask, y)
                        + dp.deep_prior(xm, "tv", sqrt=True), "admm")
    rhos_c, sig_c = dp.log_descent(30, 5, span[1], sigma=0.01)
    return lambda: bench._marginal_its(
        lambda n: solver.solve(x0=s["x0"], max_iter=n,
                               rhos=rhos_c[:n], lams=sig_c[:n],
                               params=s["params"], real_output=True), *span)


def deconv_fft():
    import bench

    def run():
        its, _, _ = bench.bench_admm()
        return its
    return run


PATHS = {"joint_dd_cg": joint_dd_cg, "csmri_fast": csmri_fast,
         "deconv_fft": deconv_fft}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", choices=sorted(PATHS), required=True)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--span", type=str, default=None,
                    help="lo,hi override")
    a = ap.parse_args()
    kw = {}
    if a.span:
        lo, hi = a.span.split(",")
        kw["span"] = (int(lo), int(hi))
    meas = PATHS[a.path](**kw)
    obs = []
    for i in range(a.n):
        t0 = time.perf_counter()
        v = float(meas())
        obs.append(round(v, 1))
        print(f"run {i}: {v:.1f} its/s ({time.perf_counter()-t0:.1f} s)",
              flush=True)
    arr = np.asarray(obs)
    print(json.dumps({
        "path": a.path, "device": str(jax.devices()[0]), "obs": obs,
        "min": float(arr.min()), "max": float(arr.max()),
        "median": float(np.median(arr)),
        "rel_spread": round(float((arr.max() - arr.min()) / arr.mean()), 4),
    }))


if __name__ == "__main__":
    main()
