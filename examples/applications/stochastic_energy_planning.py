"""Two-stage stochastic energy-system planning via scenario-consensus ADMM.

Extends the reference's deterministic energy-planning example
(notebooks/energy_system_planning.ipynb; dprox/contrib/energy_system.py)
to the stochastic setting the north star prescribes: demand is uncertain,
the capacity plan (first stage) must be shared across all demand
scenarios, and the per-scenario operation subproblems solve in parallel —
sharded over however many devices are available, with the consensus
reduction as the only cross-device communication.

    PYTHONPATH=. python examples/applications/stochastic_energy_planning.py \
        [--periods 128] [--tech 8] [--scenarios 8] [--mesh]
"""
import argparse
import os

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main(n_periods=128, n_tech=8, n_scenarios=8, use_mesh=False,
         max_outer=600):
    from dprox_tpu.algo.lp import solve_consensus_lp
    from dprox_tpu.contrib.energy_system import (extensive_form,
                                                 synthetic_cep_scenarios)

    c, A_ub, A_eq, b_ub, b_eq_s, shared = synthetic_cep_scenarios(
        n_periods, n_tech, n_scenarios)
    print(f"{n_scenarios} scenarios x {c.shape[0]} vars "
          f"({n_tech} shared capacity + {n_tech * n_periods} operation)")

    mesh = None
    if use_mesh:
        from dprox_tpu.parallel import create_mesh

        n_dev = len(jax.devices())
        n_dev = max(d for d in range(1, n_dev + 1) if n_scenarios % d == 0)
        mesh = create_mesh(("scenario",), (n_dev,))
        print(f"sharding scenarios over {n_dev} devices")

    z, x_s, history, res = solve_consensus_lp(
        c, A_ub, b_ub, A_eq, b_eq_s, shared, mesh=mesh,
        max_outer=max_outer, eval_freq=50, tol=1e-3, verbose=True)

    print("\nconsensus capacity plan (per technology):")
    print(np.array2string(z, precision=2))
    print(f"expected total cost: {res['objective']:.2f}")
    print(f"nonanticipativity residual: {res['r_nonanticipativity']:.3e}")

    # cross-check against the extensive-form LP when it is small enough
    if n_scenarios * c.shape[0] <= 64_000:
        from scipy.optimize import linprog

        cf, Auf, Aef, buf, bef = extensive_form(c, A_ub, A_eq, b_ub,
                                                b_eq_s, shared)
        ref = linprog(cf, Auf, buf, Aef, bef, bounds=(0, None),
                      method="highs")
        gap = 100 * (res["objective"] - ref.fun) / abs(ref.fun)
        print(f"extensive-form optimum (HiGHS): {ref.fun:.2f} "
              f"(gap {gap:+.3f}%)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--periods", type=int, default=128)
    ap.add_argument("--tech", type=int, default=8)
    ap.add_argument("--scenarios", type=int, default=8)
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--outer", type=int, default=600)
    a = ap.parse_args()
    main(a.periods, a.tech, a.scenarios, a.mesh, a.outer)
