"""Scenario-consensus LP benchmark: progressive-hedging ADMM over a mesh.

The BASELINE.json north-star workload "block-separable consensus-ADMM
over scenario batches, multi-host". Solves a two-stage stochastic
capacity-expansion LP with S scenarios, reports wall-clock, objective
gap vs the extensive-form HiGHS solution, and (on a multi-device mesh)
the scenario-weak-scaling rate.

    python benchmarks/lp_consensus.py [--periods 256] [--tech 16]
        [--scenarios 8] [--mesh 0|N] [--outer 300]

--mesh N shards scenarios over an N-device mesh (use with the virtual
CPU mesh or a real slice); --mesh 0 runs the single-device batched path
(the real-TPU default here: one chip).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax

# the axon sitecustomize pre-imports jax pinned to the TPU platform; honor
# an explicit CPU request (needed for the virtual-device mesh runs)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("JAX_ENABLE_X64"):
    jax.config.update("jax_enable_x64", True)


def main(n_periods=256, n_tech=16, n_scenarios=8, mesh_n=0, max_outer=300,
         skip_ref=False, fused=False):
    from scipy.optimize import linprog

    from dprox_tpu.algo.lp import solve_consensus_lp
    from dprox_tpu.contrib.energy_system import (extensive_form,
                                                 synthetic_cep_scenarios)

    c, A_ub, A_eq, b_ub, b_eq_s, sh = synthetic_cep_scenarios(
        n_periods, n_tech, n_scenarios)

    ref_obj = None
    t_highs = None
    if not skip_ref:
        cf, Auf, Aef, buf, bef = extensive_form(c, A_ub, A_eq, b_ub, b_eq_s, sh)
        t0 = time.perf_counter()
        ref = linprog(cf, Auf, buf, Aef, bef, bounds=(0, None), method="highs")
        t_highs = time.perf_counter() - t0
        ref_obj = float(ref.fun)

    mesh = None
    if mesh_n:
        from dprox_tpu.parallel import create_mesh

        mesh = create_mesh(("scenario",), (mesh_n,))

    t0 = time.perf_counter()
    z, xs, hist, res = solve_consensus_lp(
        c, A_ub, b_ub, A_eq, b_eq_s, sh, mesh=mesh, max_outer=max_outer,
        eval_freq=50, tol=1e-3, rho_ph=1.0, verbose=False, fused=fused)
    t_admm = time.perf_counter() - t0
    t_warm = None
    if fused:
        # second call hits the cached executable: pure compute
        t0 = time.perf_counter()
        z, xs, hist, res = solve_consensus_lp(
            c, A_ub, b_ub, A_eq, b_eq_s, sh, mesh=mesh, max_outer=max_outer,
            eval_freq=50, tol=1e-3, rho_ph=1.0, verbose=False, fused=fused)
        t_warm = time.perf_counter() - t0

    out = {
        "metric": "lp_consensus_stochastic_cep",
        "device": str(jax.devices()[0]),
        "n_scenarios": int(n_scenarios),
        "mesh_devices": int(mesh_n) if mesh_n else 1,
        "n_var_per_scenario": int(c.shape[0]),
        "outer_iters": res["outer_iters"],
        "consensus_wallclock_s": round(t_admm, 2),
        "consensus_warm_wallclock_s": round(t_warm, 2) if fused else None,
        "steady_s_per_outer": round(
            float(np.median(hist["t_chunk"][1:])) / 50, 4)
        if len(hist.get("t_chunk", [])) > 1 else None,
        "objective": round(res["objective"], 2),
        "r_nonanticipativity": res["r_nonanticipativity"],
        "r_primal": res["r_primal"],
    }
    if ref_obj is not None:
        out["highs_extensive_objective"] = round(ref_obj, 2)
        out["highs_wallclock_s"] = round(t_highs, 2)
        out["objective_gap_pct"] = round(
            100 * (res["objective"] - ref_obj) / abs(ref_obj), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--periods", type=int, default=256)
    ap.add_argument("--tech", type=int, default=16)
    ap.add_argument("--scenarios", type=int, default=8)
    ap.add_argument("--mesh", type=int, default=0)
    ap.add_argument("--outer", type=int, default=300)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--fused", action="store_true")
    a = ap.parse_args()
    main(a.periods, a.tech, a.scenarios, a.mesh, a.outer, a.skip_ref,
         a.fused)
