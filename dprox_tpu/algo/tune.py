"""Hyperparameter schedules: DPIR-style log-space descent.

Counterpart of /root/reference/dprox/algo/tune/dpir.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def log_descent(upper, lower, iter: int = 24, sigma: float = 0.255 / 255,
                w: float = 1.0, lam: float = 0.23, sqrt: bool = False):
    """Per-iteration (rhos, sigmas) schedules (reference: dpir.py:14-41).

    Returns jnp arrays of length ``iter``; sigmas are squared unless
    ``sqrt=True`` (matching the reference's convention where deep priors
    consume sigma^2 through safe_sqrt).
    """
    modelSigmaS = np.logspace(np.log10(upper), np.log10(lower), iter).astype(np.float32)
    modelSigmaS_lin = np.linspace(upper, lower, iter).astype(np.float32)
    sigmas = (modelSigmaS * w + modelSigmaS_lin * (1 - w)) / 255.0
    rhos = np.array([lam * (sigma**2) / (s**2) for s in sigmas], np.float32)
    if not sqrt:
        sigmas = sigmas**2
    return jnp.asarray(rhos), jnp.asarray(sigmas.astype(np.float32))


def get_rho_sigma_admm(sigma=2.55 / 255, iter_num=15, modelSigma1=49.0,
                       modelSigma2=2.55, w=1.0, lam=0.23):
    """(reference: dpir.py:5-11)"""
    modelSigmaS = np.logspace(np.log10(modelSigma1), np.log10(modelSigma2),
                              iter_num).astype(np.float32)
    modelSigmaS_lin = np.linspace(modelSigma1, modelSigma2, iter_num).astype(np.float32)
    sigmas = (modelSigmaS * w + modelSigmaS_lin * (1 - w)) / 255.0
    rhos = [lam * (sigma**2) / (s**2) for s in sigmas]
    return jnp.asarray(np.array(rhos, np.float32)), jnp.asarray(sigmas)
