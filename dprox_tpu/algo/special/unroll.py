"""Algorithm unrolling specialization.

Counterpart of /root/reference/dprox/algo/specialization/unroll.py.
share=True simply pins (max_iter, schedules) onto solve; share=False
learns per-iteration rho/lam (and optionally per-step denoiser weights
via deep_prior(unroll_step=...)). Learnable schedules live in the
explicit ``params`` dict ('unroll_rhos'/'unroll_lams') so optax
training differentiates through the scanned solver.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax.numpy as jnp

from ...utils.misc import to_jax_array
from ..base import Algorithm


def build_unrolled_solver(solver: Algorithm, share: bool = True, **kwargs):
    """(reference: unroll.py:14-18)"""
    if share:
        solver.solve = partial(solver.solve, **kwargs)
        return solver
    return UnrolledSolver(solver, **kwargs)


class UnrolledSolver:
    """(reference: unroll.py:21-58)"""

    def __init__(self, solver: Algorithm, max_iter: int = 10,
                 learned_params: bool = False, rhos=None, lams=None, **kwargs):
        self.solver = solver
        self.max_iter = max_iter
        self.learned_params = learned_params
        rhos_arr, lam_list = solver.defaults(rhos, lams, max_iter)
        self._rhos0 = rhos_arr
        self._lams0 = lam_list

    def init_params(self):
        if not self.learned_params:
            return {}
        return {"unroll_rhos": self._rhos0,
                "unroll_lams": tuple(self._lams0)}

    def solve(self, x0=None, params: Optional[dict] = None, **kwargs):
        params = dict(params) if params else {}
        rhos = params.get("unroll_rhos", self._rhos0)
        lams = params.get("unroll_lams", self._lams0)
        return self.solver.solve(x0=x0, rhos=rhos, lams=list(lams),
                                 max_iter=self.max_iter, params=params,
                                 **kwargs)

    def __getattr__(self, name):
        return getattr(self.solver, name)
