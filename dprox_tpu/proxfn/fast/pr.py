"""Phase retrieval: coded-diffraction-pattern forward/backward + prox.

Counterpart of /root/reference/dprox/proxfn/fast/pr.py. The reference's
``phase_ret.prox`` is an unimplemented stub (pr.py:13-21); here the
amplitude-flow gradient prox sketched in its comments is implemented.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...linop.base import Placeholder
from ...utils.misc import to_jax_array
from ..base import ProxFn


def cdp_forward(data, mask):
    """Coded diffraction forward: [B,1,H,W] complex x [B,S,H,W] mask ->
    [B,S,H,W] field (reference: pr.py:24-40)."""
    sampling_rate = mask.shape[1]
    x = jnp.tile(data, (1, sampling_rate, 1, 1))
    return jnp.fft.fft2(x * mask, norm="ortho")


def cdp_backward(data, mask):
    """Adjoint of cdp_forward (reference: pr.py:43-58)."""
    ifft = jnp.fft.ifft2(data, norm="ortho")
    return jnp.mean(ifft * jnp.conj(mask), axis=1, keepdims=True)


class phase_ret(ProxFn):
    """Amplitude-flow proximal step for |A z| = y0 measurements."""

    def __init__(self, linop, mask, y0, tau: float = 0.1, steps: int = 1):
        super().__init__(linop)
        self.mask = mask
        self.y0 = y0
        self.tau = tau
        self.steps = steps

    def _value(self, x, params):
        if isinstance(x, Placeholder):
            return x.value(params)
        return to_jax_array(x, batch=True)

    def _prox(self, v, lam, params=None, step=None):
        mask = self._value(self.mask, params)
        y0 = self._value(self.y0, params)
        z = v.astype(jnp.complex64)
        for _ in range(self.steps):
            Az = cdp_forward(z, mask)
            y_hat = jnp.abs(Az) + 1e-9
            meas_err = y_hat - y0
            grad_fwd = (meas_err / y_hat) * Az
            grad = cdp_backward(grad_fwd, mask)
            z = z - self.tau * (grad + lam * (z - v))
        return z
