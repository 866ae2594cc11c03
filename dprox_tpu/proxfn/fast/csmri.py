"""Compressed-sensing MRI fused x-update.

Counterpart of /root/reference/dprox/proxfn/fast/csmri.py:8-27: the
masked-Fourier data term ||M F x - y||^2 admits a closed-form x-update in
the (centered, orthonormal) Fourier domain:

    masked freq:   (y + rho * sum_i v_i~) / (1 + rho * n)
    unmasked freq:  mean_i v_i~

(The reference omits the 1/n on unmasked frequencies, valid only for a
single psi block — fixed here; identical for n = 1, the tested path.)
"""
from __future__ import annotations

import jax.numpy as jnp

from ...linop.base import Placeholder
from ...utils.fft import fft2_center, ifft2_center
from ...utils.misc import to_jax_array
from ..sum_squares import ext_sum_squares


class csmri(ext_sum_squares):
    # the fused solve lives in k-space: solver states must be complex
    complex_state = True

    def __init__(self, linop, mask, y):
        super().__init__(linop)
        self.mask = mask
        self.y = y

    def _value(self, x, params):
        if isinstance(x, Placeholder):
            return x.value(params)
        return to_jax_array(x, batch=True)

    def _solve(self, xtilde, rho, n, params):
        y = self._value(self.y, params)
        mask = self._value(self.mask, params).astype(bool)
        z = fft2_center(xtilde.astype(jnp.complex64))
        masked = (rho * z + y) / (1.0 + rho * n)
        z = jnp.where(mask, masked, z / n)
        out = ifft2_center(z)
        # CSMRI states are complex through the iteration (the denoiser
        # prox takes the real part); mirror the reference's dtype flow.
        return out
