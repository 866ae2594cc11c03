"""Proximal gradient descent (reference: /root/reference/dprox/algo/pgd.py).

Exactly two proxfns: one differentiable (grad method) as omega, one psi.
x <- prox_psi(x - rho * grad_omega(x)).
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..proxfn.base import ProxFn
from ..utils.misc import expand_to_bchw
from .base import Algorithm


class ProximalGradientDescent(Algorithm):
    @classmethod
    def partition(cls, prox_fns: List[ProxFn]):
        if len(prox_fns) != 2:
            raise ValueError("PGD supports exactly two proximal functions")
        omega_fns = [fn for fn in prox_fns if hasattr(fn, "grad")]
        psi_fns = [fn for fn in prox_fns if fn not in omega_fns]
        if len(omega_fns) == 0:
            raise ValueError("PGD requires one differentiable function")
        if len(psi_fns) == 0:
            # both differentiable: keep the first as omega, prox the second
            omega_fns, psi_fns = [prox_fns[0]], [prox_fns[1]]
        return psi_fns, omega_fns

    def __init__(self, psi_fns, omega_fns):
        super().__init__(psi_fns, omega_fns)
        self.diff_fn = omega_fns[0]
        self.prox_fn = psi_fns[0]

    def initialize(self, x0, params):
        return (x0,)

    def _iter(self, state, rho, lam, step, params, aux):
        (x,) = state
        v = x - expand_to_bchw(jnp.asarray(rho)) * self.diff_fn.grad(x, params)
        x = self.prox_fn.prox(v, lam[0], params=params, step=step,
                              offset=aux.offsets[0])
        return (x,)

    @property
    def state_split(self):
        return [1]

    @property
    def nparams(self):
        return len(self.psi_fns) + 1
