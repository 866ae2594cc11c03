"""Problem entry object (reference: /root/reference/dprox/algo/problem.py).

Dispatches matmul objectives (c @ x with A @ x <= b constraints) to the
LP solver path; everything else compiles to a proximal solver.
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

from ..linalg import LinearSolveConfig
from ..linop.constraints import equality, less, matmul
from ..proxfn.base import ProxFn
from .primitives import compile, optimize


class Problem:
    def __init__(self, prox_fns=None, constraints=None, absorb: bool = True,
                 merge: bool = False, try_diagonalize: bool = True,
                 try_freq_diagonalize: bool = True,
                 linear_solve_config: Optional[LinearSolveConfig] = None):
        if isinstance(prox_fns, matmul):
            self._lp = LPProblem(prox_fns, constraints or [])
            self.prox_fns = None
            return
        self._lp = None
        if isinstance(prox_fns, ProxFn):
            prox_fns = [prox_fns]
        self.raw_prox_fns = list(prox_fns)
        self.absorb = absorb
        self.try_diagonalize = try_diagonalize
        self.try_freq_diagonalize = try_freq_diagonalize
        self.linear_solve_config = linear_solve_config or LinearSolveConfig()
        self.prox_fns = optimize(self.raw_prox_fns, absorb=absorb)

    @property
    def objective(self):
        return self.prox_fns

    def solve(self, method: str = "admm", device=None, **kwargs):
        if self._lp is not None:
            return self._lp.solve(**kwargs)
        solver = compile(
            self.prox_fns, method=method,
            try_diagonalize=self.try_diagonalize,
            try_freq_diagonalize=self.try_freq_diagonalize,
            linear_solve_config=self.linear_solve_config,
        ) if method != "pgd" else compile(self.prox_fns, method=method)
        return solver.solve(**kwargs)

    def optimize(self):
        self.prox_fns = optimize(self.raw_prox_fns, absorb=self.absorb)
        return self

    def visualize(self, filename=None):
        from ..linop.visualize import visualize as _vis

        return "\n\n".join(_vis(fn.linop, filename) for fn in self.prox_fns)


class LPProblem:
    """LP wrapper: pre-trains learnable ADMM hyperparameters on a
    convergence loss before the final solve (reference: problem.py:61-121)."""

    def __init__(self, objective: matmul, constraints: List):
        self.c = objective.A
        self.x = objective.x
        A_ub, b_ub, A_eq, b_eq = [], [], [], []
        for con in constraints:
            if isinstance(con, less):
                A_ub.append(con.A)
                b_ub.append(con.b)
            elif isinstance(con, equality):
                A_eq.append(con.A)
                b_eq.append(con.b)
        self.A_ub, self.b_ub = A_ub, b_ub
        self.A_eq, self.b_eq = A_eq, b_eq

    def solve(self, max_iters: int = 20000, pretrain_steps: int = 10,
              **kwargs):
        import numpy as np
        import scipy.sparse as sp

        from .lp import LPSolverADMM, solve_lp

        A_ub = sp.vstack([sp.csr_matrix(a) for a in self.A_ub]) if self.A_ub else None
        b_ub = np.concatenate([np.asarray(b).ravel() for b in self.b_ub]) if self.b_ub else None
        A_eq = sp.vstack([sp.csr_matrix(a) for a in self.A_eq]) if self.A_eq else None
        b_eq = np.concatenate([np.asarray(b).ravel() for b in self.b_eq]) if self.b_eq else None
        c = np.asarray(self.c).ravel()
        return solve_lp(c, A_ub, b_ub, A_eq, b_eq, max_iters=max_iters,
                        pretrain_steps=pretrain_steps, **kwargs)
