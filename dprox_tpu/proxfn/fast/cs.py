"""Compressive-sensing (coded-aperture) fused x-update.

Counterpart of /root/reference/dprox/proxfn/fast/cs.py:6-27: forward
A x = sum_c mask_c * x_c; closed form via the Sherman-Morrison-style
rank-structured update with phi = sum mask^2.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...linop.base import Placeholder
from ...utils.misc import to_jax_array
from ..sum_squares import ext_sum_squares


class compress_sensing(ext_sum_squares):
    def __init__(self, linop, mask, y):
        super().__init__(linop)
        self.mask = mask
        self.y = y

    def _value(self, x, params):
        if isinstance(x, Placeholder):
            return x.value(params)
        return to_jax_array(x, batch=True)

    def _solve(self, xtilde, rho, n, params):
        mask = self._value(self.mask, params).astype(jnp.float32)
        y = self._value(self.y, params)
        phi = jnp.sum(mask**2, axis=1, keepdims=True)

        def A(x):
            return jnp.sum(x * mask, axis=1, keepdims=True)

        def At(x):
            return x * mask

        rhs = At((n * y - A(xtilde)) / (phi + n * rho))
        return (xtilde + rhs) / n
