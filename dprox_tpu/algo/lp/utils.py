"""LP utilities: Ruiz equilibration and sparse-operator conversion.

Counterpart of /root/reference/dprox/algo/lp/utils.py. Equilibration runs
host-side on scipy sparse matrices (one-time preprocessing); the
equilibrated matrix is converted to a jax.experimental.sparse BCOO pair
(A, A^T) whose matvecs run on device inside the ADMM loop.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp
from scipy.sparse import linalg as slinalg

import jax.numpy as jnp
from jax.experimental import sparse as jsparse


def ruiz_equilibration_sparse(A: sp.spmatrix, c: np.ndarray, b: np.ndarray,
                              ord=np.inf, max_iters: int = 20,
                              verbose: bool = False):
    """Iterative row/column inf-norm scaling (reference: utils.py:106-154)."""
    A = sp.csr_matrix(A, dtype=np.float64)
    m, n = A.shape
    e = np.ones(m)
    d = np.ones(n)
    A_bar = A.copy()
    eps_equil = 1e-3
    for _ in range(max_iters):
        cn = slinalg.norm(A_bar, ord=np.inf, axis=0)
        rn = slinalg.norm(A_bar, ord=np.inf, axis=1)
        cn[cn == 0] = 1.0
        rn[rn == 0] = 1.0
        delta1 = 1.0 / np.sqrt(cn)
        delta2 = 1.0 / np.sqrt(rn)
        d = d * delta1
        e = e * delta2
        A_bar = sp.diags(e) @ A @ sp.diags(d)
        if max(np.abs(1 - delta1).max(), np.abs(1 - delta2).max()) < eps_equil:
            break
    c_bar = c * d
    Arnorm = slinalg.norm(A_bar, ord=np.inf, axis=1)
    Acnorm = slinalg.norm(A_bar, ord=np.inf, axis=0)
    b_bar = b * e[: b.shape[0]]
    nrm_c = np.linalg.norm(c_bar, ord=np.inf)
    finite_b = b_bar[np.isfinite(b_bar)]
    nrm_b = np.linalg.norm(finite_b, ord=np.inf) if finite_b.size else 1.0
    gamma_c = (1.0 / nrm_c if nrm_c > 0 else 1.0) * Arnorm.mean()
    gamma_b = (1.0 / nrm_b if nrm_b > 0 else 1.0) * Acnorm.mean()
    if verbose:
        print(f"Acnorm max/mean: {Acnorm.max():.3f}/{Acnorm.mean():.3f}")
    return d, e, float(gamma_c), float(gamma_b), A_bar, Acnorm


def scipy_to_bcoo(A: sp.spmatrix, dtype=jnp.float64):
    """CSR/COO scipy matrix -> (A, A^T) BCOO device operators."""
    coo = sp.coo_matrix(A)
    idx = np.stack([coo.row, coo.col], axis=1)
    Aj = jsparse.BCOO((jnp.asarray(coo.data, dtype), jnp.asarray(idx)),
                      shape=coo.shape)
    cooT = sp.coo_matrix(A.T)
    idxT = np.stack([cooT.row, cooT.col], axis=1)
    ATj = jsparse.BCOO((jnp.asarray(cooT.data, dtype), jnp.asarray(idxT)),
                       shape=cooT.shape)
    return Aj, ATj
