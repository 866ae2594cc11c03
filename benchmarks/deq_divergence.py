"""Root-cause probe for the CSMRI trained-DEQ CPU/TPU divergence
(VERDICT r4 weak #2 / next #2).

Round 4 re-pinned the DEQ grid with SEPARATE goldens per backend (CPU
30.99 / TPU 32.59 at the noiseless cell — 1.6 dB apart). A fixed-point
method whose equilibrium moves across backends has an uncharacterized
numerical sensitivity; candidate cause is the TPU's default-bf16
matmul/conv accumulation inside the denoiser compounding through ~24
fixed-point iterations (CLAUDE.md).

This probe measures, per grid cell and per backend:
  * the shipped anderson solve (as the grid test runs it),
  * the same solve traced under jax.default_matmul_precision('highest'),
  * a plain Picard trajectory of the fixed-point map f (no Anderson
    mixing) with per-iteration PSNR + residual — where the backends'
    trajectories split localizes the entry point of the divergence.

Run on each backend, then diff the JSON lines:
    python benchmarks/deq_divergence.py            # current backend
    JAX_PLATFORMS=cpu python benchmarks/deq_divergence.py --force-cpu
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main(picard_iters=32, cells=((50, 0.0), (40, 0.05))):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flax import serialization

    import dprox_tpu as dp
    from dprox_tpu.contrib import csmri
    from dprox_tpu.proxfn.pnp.prior import get_denoiser
    from dprox_tpu.utils import metrics

    path = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "deq_csmri.msgpack")
    den = get_denoiser("distilled_gray")

    def build():
        x = dp.Variable()
        y = dp.Placeholder("y")
        mask = dp.Placeholder("mask", batch=False)
        reg = dp.deep_prior(x, den, sqrt=True, param_key="deq_prior")
        solver = dp.compile(dp.csmri(x, mask, y) + reg, method="admm")
        return solver

    params0 = {"deq_r": np.float32(1.0), "deq_l": np.float32(1.0),
               "deq_prior": den.params}
    with open(path, "rb") as f:
        params0 = serialization.from_bytes(params0, f.read())

    report = {"device": str(jax.devices()[0]), "cells": []}
    for num_lines, sigma in cells:
        s = csmri.generate_sample(size=128, num_lines=num_lines, sigma=sigma)
        row = {"num_lines": num_lines, "sigma": sigma}

        for tag, prec in (("default", None), ("highest", "highest")):
            solver = build()
            deq = dp.specialize(solver, method="deq", learned_params=True,
                                f_thres=24, b_thres=16)
            p = dict(params0)
            p.update(s["params"])
            ctx = (jax.default_matmul_precision(prec) if prec
                   else _nullcontext())
            with ctx:
                out = deq.solve(x0=np.real(s["x0"]).astype(np.float32),
                                rhos=0.3, lams=0.05, params=p,
                                real_output=True)
                out = np.asarray(out)
            row[f"anderson_{tag}_psnr"] = round(
                float(metrics.psnr(out, s["gt"])), 3)

        # plain Picard trajectory of f — per-iteration PSNR + residual
        for tag, prec in (("default", None), ("highest", "highest")):
            solver = build()
            from dprox_tpu.algo.base import encode_complex, decode_complex

            x0 = np.real(s["x0"]).astype(np.float32)
            p = dict(params0)
            p.update(s["params"])
            rhos_arr, lam_list = solver.defaults(0.3 * float(p["deq_r"]),
                                                 0.05 * float(p["deq_l"]), 1)

            def make_step():
                def step(z, params):
                    params = decode_complex(params)
                    aux = solver.prepare_aux(jnp.asarray(x0), params)
                    state = solver.unpack(z)
                    state = solver._iter(tuple(state), rhos_arr[0],
                                         [l[0] for l in lam_list], 0,
                                         params, aux)
                    return solver.pack(state)
                return jax.jit(step)

            ctx = (jax.default_matmul_precision(prec) if prec
                   else _nullcontext())
            with ctx:
                step = make_step()
                # init inside jit: complex host->device transfers are
                # unimplemented on the axon backend (CLAUDE.md)
                z = jax.jit(lambda pe: solver.pack(solver.initialize(
                    jnp.asarray(x0), decode_complex(pe))))(
                        encode_complex(dict(s["params"])))
                traj_psnr, traj_res = [], []
                penc = encode_complex(p)
                for _ in range(picard_iters):
                    z_new = step(z, penc)
                    x_out = np.asarray(jnp.real(solver.unpack(z_new)[0]))
                    traj_psnr.append(round(
                        float(metrics.psnr(x_out, s["gt"])), 3))
                    traj_res.append(float(jnp.linalg.norm(
                        (z_new - z).ravel())))
                    z = z_new
            row[f"picard_{tag}_psnr"] = traj_psnr
            row[f"picard_{tag}_res"] = [round(r, 6) for r in traj_res]
        report["cells"].append(row)
    print(json.dumps(report))


def _nullcontext():
    import contextlib

    return contextlib.nullcontext()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--force-cpu", action="store_true")
    ap.add_argument("--picard-iters", type=int, default=32)
    a = ap.parse_args()
    if a.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(picard_iters=a.picard_iters)
