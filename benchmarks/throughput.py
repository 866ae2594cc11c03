"""Serving throughput: batched ADMM image-iterations/sec vs batch size.

Fetch-forced marginal-cost methodology (see bench.py). Run on the real
TPU; prints one JSON line.
"""
import os
import sys
import time
import json

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def main(H=512):
    import dprox_tpu as dp
    from dprox_tpu.utils import imaging

    img = imaging.sample("face")[:, :, :H, :H]
    psf = imaging.point_spread_function(15, 5)
    b1 = imaging.blurring(img, psf)
    x = dp.Variable()
    data = dp.sum_squares(dp.conv(x, psf) - b1)
    solver = dp.compile([data, dp.nonneg(x)], method="admm")

    results = {}
    for B in (1, 2, 4, 8):
        b = jnp.tile(b1, (B, 1, 1, 1))

        def timed(iters):
            out = solver.solve(x0=b, max_iter=iters, rhos=0.05, lams=0.01)
            float(jnp.mean(out))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                out = solver.solve(x0=b, max_iter=iters, rhos=0.05, lams=0.01)
                float(jnp.mean(out))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = timed(24), timed(124)
        results[B] = B * 100 / max(t_hi - t_lo, 1e-9)
        print(f"B={B}: {results[B]:.0f} image-iters/s")

    print(json.dumps({
        "metric": "batched_admm_image_iters_per_sec_512x512",
        "by_batch": {str(k): round(v, 1) for k, v in results.items()},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
