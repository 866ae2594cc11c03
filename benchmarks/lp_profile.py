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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--periods", type=int, default=512)
    ap.add_argument("--tech", type=int, default=16)
    ap.add_argument("--admm-iters", type=int, default=200)
    a = ap.parse_args()
    main(a.periods, a.tech, a.admm_iters)
