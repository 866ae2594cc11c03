"""Energy-system planning LP with the learnable ADMM solver.

Counterpart of /root/reference/notebooks/energy_system_planning.ipynb:
loads the capacity-expansion LP (cached .mat instance or the synthetic
fallback), pretrains (rho, sigma, alpha, gamma) on the convergence loss,
then solves with residual balancing.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)


def main():
    from dprox_tpu.algo.lp import solve_lp
    from dprox_tpu.contrib.energy_system import load_simple_cep_model

    c, A_ub, A_eq, b_ub, b_eq = load_simple_cep_model()
    t0 = time.time()
    x, history, results = solve_lp(c, A_ub, b_ub, A_eq, b_eq,
                                   max_iters=20000, pretrain_steps=10)
    dt = time.time() - t0
    objval, r_norm, s_norm, eps_p, eps_d = results
    x = np.asarray(x)
    print(f"objective: {float(objval):.1f}  wall-clock: {dt:.1f}s")
    print(f"x>=0 err: {min(x.min(), 0):.2e}")
    if A_eq is not None:
        print(f"Ax=b err: {np.abs(A_eq @ x - b_eq).max():.2e}")
    if A_ub is not None:
        print(f"Ax<=b err: {max((A_ub @ x - b_ub).max(), 0):.2e}")


if __name__ == "__main__":
    main()
