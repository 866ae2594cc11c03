"""A/B: fused-Pallas-tail CG vs plain while_loop CG on the real TPU.

BASELINE.json's north star asks for the CG/PCG solver "rewritten as
Pallas kernels". The matvec of the imaging CG is FFT/conv-based (XLA
FFT thunks — not expressible better in Pallas), so the Pallas surface
is the iteration tail: both bdot reductions + all three axpys fused
into one VMEM pass (ops/pallas_kernels.py::fused_cg_tail). This
benchmark measures outer ADMM its/s on the joint demosaic-deconv
problem (the CG execution path, 40 inner CG iters) with
solver_type="cg" vs "cg_pallas", plus a raw CG-solve microbenchmark on
the same KtK operator. Result is recorded in the README TPU-kernels
row; the faster variant is what compile() should default to.

    python benchmarks/cg_pallas_ab.py
"""
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


def marginal_its(solve, lo=4, hi=16, reps=3):
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


def build(solver_type: str, precond: bool):
    img = imaging.sample("face")[:, :, :256, :256]
    psf = imaging.point_spread_function(9, 2)
    b = imaging.mosaicing(imaging.blurring(img, psf))
    x = dp.Variable()
    data = dp.sum_squares(dp.mosaic(dp.conv(x, psf)) - dp.Placeholder("b"))
    solver = dp.compile(
        data + dp.deep_prior(x, "tv"), "admm",
        linear_solve_config=dp.LinearSolveConfig(
            max_iters=40, solver_type=solver_type),
        try_freq_diagonalize=True)
    if not precond:
        # strip the freq-Jacobi preconditioner hoist so BOTH variants run
        # the plain (non-pcg-upgraded) loop — the A/B isolates the tail
        # kernel, not the preconditioner
        orig = solver.least_square.prepare
        solver.least_square.prepare = lambda *a, **k: {
            k2: v for k2, v in orig(*a, **k).items()
            if not k2.startswith("precond")}
    init = dp.utils.demosaic_from_mosaiced(b)
    rhos, sig = dp.log_descent(35, 10, 24)
    return solver, init, b, rhos, sig


def main():
    out = {"metric": "cg_pallas_ab_joint_demosaic_deconv_256",
           "device": str(jax.devices()[0])}
    for st in ("cg", "cg_pallas"):
        solver, init, b, rhos, sig = build(st, precond=False)
        its = marginal_its(
            lambda n: solver.solve(x0=init, max_iter=n, rhos=rhos[:n],
                                   lams=sig[:n], params={"b": b}))
        out[f"outer_its_per_sec_{st}"] = round(its, 1)
        print(f"{st}: {its:.1f} outer its/s", file=sys.stderr, flush=True)
    out["speedup_pallas"] = round(
        out["outer_its_per_sec_cg_pallas"] / out["outer_its_per_sec_cg"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
