"""Single-photon-imaging fused x-update.

Counterpart of /root/reference/dprox/proxfn/fast/spi.py:6-90: the Poisson
binary-observation prox solved by a fixed-depth differentiable bisection
(jit-friendly: 10 masked bisection steps as a fori_loop).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...linop.base import Placeholder
from ...utils.misc import to_jax_array
from ..sum_squares import ext_sum_squares


def kron(a, b):
    """Batched Kronecker product (reference: spi.py:26-38)."""
    siz1 = (a.shape[-2] * b.shape[-2], a.shape[-1] * b.shape[-1])
    res = a[..., :, None, :, None] * b[..., None, :, None, :]
    return res.reshape(res.shape[:-4] + siz1)


def spi_forward(x, K, alpha, q, key):
    """Poisson binary observation model (reference: spi.py:41-47)."""
    ones = jnp.ones((1, 1, K, K), x.dtype)
    theta = alpha * kron(x, ones) / (K**2)
    y = jax.random.poisson(key, theta).astype(jnp.float32)
    return (y >= q).astype(jnp.float32)


def spi_inverse(ztilde, K1, K, mu):
    """Prox of the SPI likelihood via masked bisection
    (reference: spi.py:50-90; assumes alpha == K, q == 1)."""
    K0 = K**2 - K1
    zero_mask = K1 == 0
    z_zero = ztilde - K0 / mu

    def func(y):
        return K1 / (jnp.exp(y) - 1.0) - mu * y - K0 + mu * ztilde

    bmin = 1e-5 * jnp.ones_like(ztilde)
    bmax = 1.1 * jnp.ones_like(ztilde)

    def body(i, carry):
        bmin, bmax = carry
        bave = (bmin + bmax) / 2.0
        t = func(bave)
        bmin = jnp.where(t > 0, bave, bmin)
        bmax = jnp.where(t < 0, bave, bmax)
        return bmin, bmax

    bmin, bmax = jax.lax.fori_loop(0, 10, body, (bmin, bmax))
    bave = (bmin + bmax) / 2.0
    z = jnp.where(zero_mask, z_zero, bave)
    return jnp.clip(z, 0.0, 1.0)


class spi(ext_sum_squares):
    def __init__(self, linop, K, y):
        super().__init__(linop)
        self.K = K
        self.y = y

    def _value(self, x, params):
        if isinstance(x, Placeholder):
            return x.value(params)
        return to_jax_array(x, batch=True)

    def _solve(self, xtilde, rho, n, params):
        K = self._value(self.K, params) * 10
        x0 = self._value(self.y, params)
        K1 = x0 * (K**2)
        return spi_inverse(xtilde, K1, K, rho)
