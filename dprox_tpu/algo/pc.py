"""Pock-Chambolle primal-dual hybrid gradient.

Role-equivalent of /root/reference/dprox/algo/pc.py, but implemented as
textbook PDHG with the exact Moreau identity (the reference's conjugate
prox drops the inner rescaling, pc.py:24-26, which is only consistent for
identity psi operators):

    w_i   = z_i + sigma_i * K_i xbar
    z_i   = w_i - sigma_i * prox_{f_i / sigma_i}(w_i / sigma_i)
    x'    = prox_{g / rho}(x - (1/rho) * sum_i K_i^T z_i)   [least-squares]
    xbar  = 2 x' - x

sigma_i = lam[i] (dual step), rho = 1/tau (primal step). Convergence
requires tau * sigma * ||K||^2 <= 1.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.misc import expand_to_bchw
from .admm import ADMM


class PockChambolle(ADMM):
    def __init__(self, psi_fns, omega_fns, try_diagonalize=True,
                 try_freq_diagonalize=True, linear_solve_config=None):
        super().__init__(psi_fns, omega_fns, try_diagonalize,
                         try_freq_diagonalize, linear_solve_config)
        # x-update resolvent involves only the omega (data) terms:
        # (sum K_q^T K_q + rho I)^-1 (sum K_q^T b_q + rho v)
        from ..proxfn.sum_squares import ext_sum_squares, least_squares

        if not isinstance(self.least_square, ext_sum_squares):
            from ..linalg import LinearSolveConfig

            self.least_square = least_squares(
                omega_fns, [], try_diagonalize, try_freq_diagonalize,
                linear_solve_config=linear_solve_config or LinearSolveConfig())

    def initialize(self, x0, params, v=None):
        x = x0
        z = tuple(jnp.zeros_like(e) for e in self.K_forward(x, params))
        return (x, z, x)

    def residuals(self, prev_state, state, rho, params):
        # PDHG state (x, z-duals, xbar) does not fit the ADMM
        # consensus-residual template
        return None

    def _iter(self, state, rho, lam, step, params, aux):
        x, z, xbar = state

        Kxbar = self.K_forward(xbar, params)
        z_new = []
        for i, fn in enumerate(self.psi_fns):
            sigma = expand_to_bchw(jnp.asarray(lam[i]))
            w = z[i] + sigma * Kxbar[i]
            z_new.append(w - sigma * fn.prox(w / sigma, 1.0 / lam[i],
                                             params=params, step=step,
                                             offset=aux.offsets[i]))

        Ktz = 0.0
        for i, fn in enumerate(self.psi_fns):
            Ktz = Ktz + fn.dag_adjoint(z_new[i], params)
        tau = 1.0 / expand_to_bchw(jnp.asarray(rho))
        v = x - tau * Ktz
        if len(self.omega_fns) > 0:
            from ..proxfn.sum_squares import ext_sum_squares

            if isinstance(self.least_square, ext_sum_squares):
                x_next = self.least_square.solve([v], rho, params=params)
            else:
                x_next = self.least_square.solve([], rho, v=v, params=params,
                                                 var_shapes=self._var_shapes(x),
                                                 prepared=aux.lsq)
        else:
            x_next = v

        xbar = x_next + x_next - x
        return (x_next, tuple(z_new), xbar)

    @property
    def state_split(self):
        return [1, [len(self.psi_fns)], 1]
