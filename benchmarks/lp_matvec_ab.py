"""A/B the LP sparse-matvec implementations on the current backend.

Compares BCOO (gather/scatter) vs BSR at several tile shapes on the
energy-CEP constraint matrix, steady-state (compile excluded), for the
normal-equation apply AT@(A@x) the PCG loop runs twice per iteration.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp


from _timing import sustained  # noqa: E402


def main(n_periods=512, n_tech=16):
    from dprox_tpu.contrib.energy_system import synthetic_cep_model
    from dprox_tpu.algo.lp.utils import BSRMat, scipy_to_bcoo

    c, A_ub, A_eq, b_ub, b_eq = synthetic_cep_model(n_periods, n_tech)
    n = c.shape[0]
    A = sp.csr_matrix(sp.vstack([A_ub, A_eq, sp.eye(n)]))
    x = jnp.ones(n, jnp.float32)
    res = {"device": str(jax.devices()[0]), "shape": list(A.shape),
           "nnz": int(A.nnz)}

    Ab, ATb = scipy_to_bcoo(A, jnp.float32)
    res["bcoo_ms"] = round(
        1e3 * sustained(jax.jit(lambda v: ATb @ (Ab @ v)), x, reps=200), 3)

    for bm, bn in [(8, 128), (32, 128), (128, 128)]:
        op = BSRMat(A, bm=bm, bn=bn, dtype=jnp.float32)
        key = f"bsr{bm}x{bn}"
        res[key + "_tiles"] = int(op.n_tiles)
        res[key + "_MB"] = round(op.nbytes() / 1e6, 1)
        res[key + "_ms"] = round(1e3 * sustained(
            jax.jit(lambda v, op=op: op.rmatvec(op.matvec(v))), x,
            reps=200), 3)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
