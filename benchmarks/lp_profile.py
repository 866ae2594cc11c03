"""Profile the LP-ADMM hot path on the current backend.

Breaks the energy-LP solve into its cost components so optimization work
targets the right thing: sustained BCOO matvec throughput (A@x, A^T@y),
one fused PCG-style iteration, and the end-to-end chunk rate of
LPSolverADMM. Prints one JSON line.
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


from _timing import sustained  # noqa: E402


def main(n_periods=512, n_tech=16, admm_iters=200):
    from dprox_tpu.contrib.energy_system import synthetic_cep_model
    from dprox_tpu.algo.lp import LPProblem, LPSolverADMM

    c, A_ub, A_eq, b_ub, b_eq = synthetic_cep_model(n_periods, n_tech)
    dt = jnp.float32
    p = LPProblem(c, A_ub, b_ub, A_eq, b_eq, dtype=dt)
    m, n = p.problem_scale
    nnz = int(p.A.nse)
    A, AT = p.A, p.AT

    x = jnp.ones(n, dt)
    y = jnp.ones(m, dt)

    # sustained single matvecs (self-composed via padding to same shape)
    t_ax = sustained(jax.jit(lambda v: (AT @ (A @ v))), x, reps=50)
    # one full normal-equation apply + vector ops (the PCG body content)
    rho = jnp.asarray(1.0, dt)
    sigma = jnp.asarray(1e-6, dt)

    @jax.jit
    def ktk_body(v):
        return AT @ (rho * (A @ v)) + sigma * v

    t_ktk = sustained(ktk_body, x, reps=50)

    # end-to-end ADMM chunk rate at fixed small iteration budget
    solver = LPSolverADMM(dtype=dt, verbose=False)
    params = solver.init_params()
    t0 = time.perf_counter()
    _, history, results = solver.solve(p, params, max_iters=admm_iters,
                                       residual_balance=False)
    t_admm = time.perf_counter() - t0

    tc = history.get("t_chunk", [])
    steady_ms = float(np.median(tc[1:]) * 1e3) if len(tc) > 1 else None
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "shape": [int(m), int(n)], "nnz": nnz,
        "normal_eq_matvec_ms": round(t_ax * 1e3, 3),
        "ktk_body_ms": round(t_ktk * 1e3, 3),
        "admm_iters": admm_iters,
        "admm_wall_s": round(t_admm, 2),
        "first_chunk_s_incl_compile": round(tc[0], 2) if tc else None,
        "steady_chunk_ms_25it": round(steady_ms, 2) if steady_ms else None,
        "steady_ms_per_outer_iter":
            round(steady_ms / 25, 3) if steady_ms else None,
        "r_norm_last": history["r_norm"][-1],
        "s_norm_last": history["s_norm"][-1],
    }))


def fused_probe(n_periods, n_tech=16, max_iters=2000):
    """Run the RAW fused path (size gate bypassed) at one size and print
    a JSON verdict. Invoked in a subprocess by --envelope so a backend
    kernel fault cannot kill the prober."""
    os.environ["DPROX_LP_FUSED_MAX_VARS"] = str(10**9)
    from dprox_tpu.algo.lp import LPProblem, LPSolverADMM
    from dprox_tpu.contrib.energy_system import synthetic_cep_model

    c, A_ub, A_eq, b_ub, b_eq = synthetic_cep_model(n_periods, n_tech)
    p = LPProblem(c, A_ub, b_ub, A_eq, b_eq, dtype=jnp.float32)
    sv = LPSolverADMM(dtype=jnp.float32, verbose=False)
    t0 = time.perf_counter()
    x, res = sv.solve_fused(p, max_iters=max_iters)
    float(np.asarray(x)[0])
    print(json.dumps({"vars": int(p.n), "status": "pass",
                      "iters": int(res["iters"]),
                      "wall_s_incl_compile":
                          round(time.perf_counter() - t0, 1)}))


def envelope(periods_ladder=(512, 1024, 2048, 4096, 8192), n_tech=16,
             timeout_s=1200):
    """One-command pass/fault envelope of the fused LP program
    (VERDICT r4 #10): each size runs the raw fused path in a SUBPROCESS
    — the known 66k+-var axon kernel fault takes the worker down with
    it, so isolation is what makes the ladder survivable — and the
    table of verdicts prints as one JSON line at the end."""
    import subprocess

    rows = []
    for periods in periods_ladder:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--fused-probe", str(periods), "--tech", str(n_tech)]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout_s)
        except subprocess.TimeoutExpired:
            rows.append({"periods": periods, "status": "timeout",
                         "timeout_s": timeout_s})
            continue
        line = [ln for ln in r.stdout.strip().splitlines()
                if ln.startswith("{")]
        if r.returncode == 0 and line:
            row = json.loads(line[-1])
            row["periods"] = periods
            rows.append(row)
        else:
            rows.append({"periods": periods, "vars": periods * n_tech,
                         "status": "fault", "rc": r.returncode,
                         "stderr_tail": r.stderr.strip()[-300:]})
            # faults at one size imply faults above it on this backend;
            # keep probing anyway only if the caller asked via env
            if os.environ.get("DPROX_ENVELOPE_CONTINUE") != "1":
                break
    print(json.dumps({"device": str(jax.devices()[0]),
                      "fused_envelope": rows}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--periods", type=int, default=512)
    ap.add_argument("--tech", type=int, default=16)
    ap.add_argument("--admm-iters", type=int, default=200)
    ap.add_argument("--envelope", action="store_true",
                    help="subprocess-isolated pass/fault ladder of the "
                         "raw fused program (VERDICT r4 #10)")
    ap.add_argument("--fused-probe", type=int, default=None,
                    help="internal: raw fused run at N periods")
    a = ap.parse_args()
    if a.fused_probe is not None:
        fused_probe(a.fused_probe, a.tech)
    elif a.envelope:
        envelope(n_tech=a.tech)
    else:
        main(a.periods, a.tech, a.admm_iters)
