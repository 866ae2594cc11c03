"""Energy-planning LP benchmark: learnable LP-ADMM vs scipy HiGHS.

Counterpart of the reference's headline energy-system experiment
(notebooks/energy_system_planning.ipynb: LPADMM 247.9 s on A100 vs
Gurobi 85.8 s vs HiGHS 3555.9 s; objective 83432.3 vs optimum 83418.4).
The real esm_instance.mat is not available offline, so this runs the
deterministic synthetic capacity-expansion instance from
dprox_tpu.contrib.energy_system at a configurable scale and reports the
same quantities the notebook does: wall-clock, objective gap vs HiGHS,
and feasibility errors (x>=0, Ax=b, Ax<=b).

    python benchmarks/lp_energy.py [--periods 512] [--tech 16]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main(n_periods=512, n_tech=16, max_iters=20000, fused=False):
    from scipy.optimize import linprog

    from dprox_tpu.contrib.energy_system import synthetic_cep_model

    c, A_ub, A_eq, b_ub, b_eq = synthetic_cep_model(n_periods, n_tech)
    n_var = c.shape[0]

    t0 = time.perf_counter()
    ref = linprog(c, A_ub, b_ub, A_eq, b_eq, bounds=(0, None),
                  method="highs")
    t_highs = time.perf_counter() - t0

    from dprox_tpu.algo.lp import solve_lp

    t_warm = None
    if fused:
        # single-device-program path: measure cold (incl. compile) and
        # warm (cached executable) separately; defaults + on-device
        # residual balancing, no pretraining
        import jax
        import jax.numpy as jnp
        from dprox_tpu.algo.lp import LPProblem, LPSolverADMM

        dt = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        p = LPProblem(c, A_ub, b_ub, A_eq, b_eq, dtype=dt)
        s = LPSolverADMM(dtype=dt, verbose=False)
        t0 = time.perf_counter()
        x, res_f = s.solve_fused(p, max_iters=max_iters)
        float(np.asarray(x)[0])
        t_admm = time.perf_counter() - t0
        t0 = time.perf_counter()
        x, res_f = s.solve_fused(p, max_iters=max_iters)
        float(np.asarray(x)[0])
        t_warm = time.perf_counter() - t0
        history = {"r_norm": [res_f["r_norm"]] * (res_f["iters"] // 25)}
    else:
        t0 = time.perf_counter()
        x, history, results = solve_lp(c, A_ub, b_ub, A_eq, b_eq,
                                       max_iters=max_iters, verbose=False)
        t_admm = time.perf_counter() - t0
    x = np.asarray(x)

    obj = float(c @ x)
    nonneg_err = float(min(x.min(), 0.0))
    eq_err = float(np.abs(A_eq @ x - b_eq).max()) if A_eq is not None else 0.0
    ub_viol = float(max((A_ub @ x - b_ub).max(), 0.0)) if A_ub is not None else 0.0

    print(json.dumps({
        "metric": "lp_energy_synthetic_cep",
        "n_var": int(n_var),
        "n_con": int(A_ub.shape[0] + A_eq.shape[0]),
        "lpadmm_wallclock_s": round(t_admm, 2),
        "lpadmm_warm_wallclock_s": round(t_warm, 2) if t_warm else None,
        "highs_wallclock_s": round(t_highs, 2),
        "lpadmm_objective": round(obj, 2),
        "highs_objective": round(float(ref.fun), 2),
        "objective_gap_pct": round(100 * (obj - ref.fun) / abs(ref.fun), 4),
        "feasibility": {"x_nonneg_err": nonneg_err,
                        "eq_err_inf": eq_err,
                        "ub_violation_inf": ub_viol},
        "admm_evals": len(history.get("r_norm", [])),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--periods", type=int, default=512)
    ap.add_argument("--tech", type=int, default=16)
    ap.add_argument("--max-iters", type=int, default=20000)
    ap.add_argument("--fused", action="store_true")
    a = ap.parse_args()
    main(a.periods, a.tech, a.max_iters, a.fused)
