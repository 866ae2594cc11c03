"""ADMM, Linearized ADMM and ADMM-vxu as pure scan steps.

Counterpart of /root/reference/dprox/algo/admm.py. Partition rule: plain
``sum_squares`` (and at most one ``ext_sum_squares``) go to the omega
(data) set solved in the x-update; everything else becomes a psi block
with consensus variables (v_i, u_i). State = (x, v_tuple, u_tuple).
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..linalg import LinearSolveConfig
from ..proxfn.base import ProxFn
from ..proxfn.sum_squares import ext_sum_squares, sum_squares
from ..utils.misc import expand_to_bchw
from .base import Algorithm
from .invert import get_least_square_solver


class ADMM(Algorithm):
    @classmethod
    def partition(cls, prox_fns: List[ProxFn]):
        omega_fns, have_ext = [], False
        for fn in prox_fns:
            if not have_ext and isinstance(fn, ext_sum_squares):
                omega_fns.append(fn)
                have_ext = True
            elif type(fn) is sum_squares:
                omega_fns.append(fn)
        psi_fns = [fn for fn in prox_fns if fn not in omega_fns]
        return psi_fns, omega_fns

    def __init__(self, psi_fns, omega_fns, try_diagonalize=True,
                 try_freq_diagonalize=True,
                 linear_solve_config: LinearSolveConfig = None):
        super().__init__(psi_fns, omega_fns)
        self.least_square = get_least_square_solver(
            psi_fns, omega_fns, try_diagonalize, try_freq_diagonalize,
            linear_solve_config or LinearSolveConfig())

    def initialize(self, x0, params, v=None):
        x = x0
        if getattr(self.least_square, "complex_state", False):
            x = x.astype(jnp.complex64)
        if v is None:
            v = tuple(self.K_forward(x, params))
        u = tuple(jnp.zeros_like(e) for e in v)
        return (x, v, u)

    def _iter(self, state, rho, lam, step, params, aux):
        x, v, u = state
        b = [v[i] - u[i] for i in range(len(self.psi_fns))]
        x = self.least_square.solve(b, rho, params=params,
                                    var_shapes=self._var_shapes(x),
                                    prepared=aux.lsq)

        Kx = self.K_forward(x, params)
        v_new, u_new = [], []
        for i, fn in enumerate(self.psi_fns):
            vi = fn.prox(Kx[i] + u[i], lam[i], params=params, step=step,
                         offset=aux.offsets[i])
            vi = vi.astype(Kx[i].dtype)  # keep carry dtype stable (CSMRI)
            v_new.append(vi)
            u_new.append(u[i] + Kx[i] - vi)
        return (x, tuple(v_new), tuple(u_new))

    @property
    def nparams(self):
        return len(self.psi_fns) + 1

    @property
    def state_split(self):
        return [1, [len(self.psi_fns)], [len(self.psi_fns)]]


class LinearizedADMM(ADMM):
    """x-update linearized around the current iterate
    (reference: admm.py:78-100)."""

    def _iter(self, state, rho, lam, step, params, aux):
        x, v, u = state
        b = []
        for i, fn in enumerate(self.psi_fns):
            tmp = fn.dag_forward(x, params) - v[i] + u[i]
            tmp = fn.dag_adjoint(tmp, params)
            b.append(x - tmp)
        x = self.least_square.solve(b, rho, params=params,
                                    var_shapes=self._var_shapes(x),
                                    prepared=aux.lsq)

        Kx = self.K_forward(x, params)
        v_new, u_new = [], []
        for i, fn in enumerate(self.psi_fns):
            vi = fn.prox(Kx[i] + u[i], lam[i], params=params, step=step,
                         offset=aux.offsets[i])
            vi = vi.astype(Kx[i].dtype)
            v_new.append(vi)
            u_new.append(u[i] + Kx[i] - vi)
        return (x, tuple(v_new), tuple(u_new))


class ADMM_vxu(ADMM):
    """Prox-first iteration order (reference: admm.py:103-120)."""

    def _iter(self, state, rho, lam, step, params, aux):
        z, x, u = state
        Kz = self.K_forward(z, params)
        x_new = []
        for i, fn in enumerate(self.psi_fns):
            x_new.append(fn.prox(Kz[i] - u[i], lam[i], params=params, step=step,
                                 offset=aux.offsets[i]).astype(Kz[i].dtype))
        b = [x_new[i] + u[i] for i in range(len(self.psi_fns))]
        z = self.least_square.solve(b, rho, params=params,
                                    var_shapes=self._var_shapes(z),
                                    prepared=aux.lsq)
        u_new = tuple(u[i] + x_new[i] - z for i in range(len(self.psi_fns)))
        return (z, tuple(x_new), u_new)
