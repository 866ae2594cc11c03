"""Weak-scaling harness: sharded-batch ADMM over an n-device mesh.

Runs the deconvolution ADMM with the batch sharded over 1..N devices
(one image per device — weak scaling) and reports parallel efficiency.
On this rig real multi-chip hardware is unavailable; run with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
for a functional/efficiency check, or on a real pod slice unmodified.
"""
import os
import sys
import time
import json

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax

# honor JAX_PLATFORMS even though the axon sitecustomize pins the platform
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def main(H=256, iters=24, reps=3):
    import dprox_tpu as dp
    from dprox_tpu.parallel import create_mesh, solve_batched_sharded
    from dprox_tpu.utils import imaging

    img = imaging.sample("face")[:, :, :H, :H]
    psf = imaging.point_spread_function(15, 5)
    b1 = imaging.blurring(img, psf)

    x = dp.Variable()
    data = dp.sum_squares(dp.conv(x, psf) - b1)
    reg = dp.nonneg(x)
    solver = dp.compile([data, reg], method="admm")

    n_all = jax.device_count()
    results = {}
    for n in [1, 2, 4, 8]:
        if n > n_all:
            break
        mesh = create_mesh(("batch",), devices=jax.devices()[:n])
        b = jnp.tile(b1, (n, 1, 1, 1))
        run = lambda: solve_batched_sharded(solver, b, mesh, max_iter=iters,
                                            rhos=0.05, lams=0.01)
        jax.block_until_ready(run())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        results[n] = n * iters / dt  # image-iterations per second
        print(f"n={n}: {results[n]:.1f} image-iters/s")

    base = results.get(1)
    effs = {n: results[n] / (n * base) for n in results if base}
    note = None
    if jax.default_backend() == "cpu":
        note = ("virtual CPU devices share one physical machine: this run "
                "validates sharded execution, NOT scaling efficiency — run "
                "on a real pod slice for efficiency numbers")
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "image_iters_per_sec": {str(k): round(v, 1) for k, v in results.items()},
        "efficiency": {str(k): round(v, 3) for k, v in effs.items()},
        "devices": str(jax.devices()[0]),
        "note": note,
    }))


if __name__ == "__main__":
    main()
