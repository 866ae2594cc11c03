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
                 linear_solve_config: LinearSolveConfig = None,
                 spatial_mesh=None, spatial_axis: str = "space",
                 spatial_batch_axis=None):
        super().__init__(psi_fns, omega_fns)
        self.least_square = get_least_square_solver(
            psi_fns, omega_fns, try_diagonalize, try_freq_diagonalize,
            linear_solve_config or LinearSolveConfig(),
            spatial_mesh=spatial_mesh, spatial_axis=spatial_axis,
            spatial_batch_axis=spatial_batch_axis)

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
                                    prepared=aux.lsq, warm=x)

        Kx = self.K_forward(x, params)
        v_new, u_new = [], []
        for i, fn in enumerate(self.psi_fns):
            vi = fn.prox(Kx[i] + u[i], lam[i], params=params, step=step,
                         offset=aux.offsets[i])
            vi = vi.astype(Kx[i].dtype)  # keep carry dtype stable (CSMRI)
            v_new.append(vi)
            u_new.append(u[i] + Kx[i] - vi)
        return (x, tuple(v_new), tuple(u_new))

    def residuals(self, prev_state, state, rho, params):
        """Classic scaled-ADMM residuals (Boyd et al. §3.3), relative:
        r_p = ||Kx - v|| / max(||Kx||, ||v||),
        r_d = ||K^T (v - v_prev)|| / max(||K^T u||, ||K^T v||)
        (s = rho K^T dv and y = rho u, so rho cancels; the ||K^T v||
        fallback keeps the scale finite when the dual is identically
        zero, i.e. all constraints inactive). Also valid for ADMM_vxu's
        (z, x, u) state, whose slots play the same lsq-variable /
        prox-output / dual roles."""
        x, v, u = state
        v_prev = prev_state[1]

        def nrm(ts):
            return jnp.sqrt(sum(jnp.sum(jnp.abs(t) ** 2) for t in ts))

        Kx = self.K_forward(x, params)
        n = len(self.psi_fns)
        r_p = nrm([Kx[i] - v[i] for i in range(n)])
        p_scale = jnp.maximum(nrm(Kx), nrm(v)) + 1e-12
        s = [self.psi_fns[i].dag_adjoint(v[i] - v_prev[i], params)
             for i in range(n)]
        y = [self.psi_fns[i].dag_adjoint(u[i], params) for i in range(n)]
        Ktv = [self.psi_fns[i].dag_adjoint(v[i], params) for i in range(n)]
        r_d = nrm(s)
        d_scale = jnp.maximum(nrm(y), nrm(Ktv)) + 1e-12
        return {"r_primal": r_p / p_scale, "r_dual": r_d / d_scale}

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
                                    prepared=aux.lsq, warm=x)

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
                                    prepared=aux.lsq, warm=z)
        u_new = tuple(u[i] + x_new[i] - z for i in range(len(self.psi_fns)))
        return (z, tuple(x_new), u_new)
