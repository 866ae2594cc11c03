"""Pallas kernels vs jnp reference oracles (interpret-compatible on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dprox_tpu.ops.pallas_kernels import (_admm_update_ref, _freq_divide_ref,
                                          bdot_pallas, freq_divide,
                                          fused_admm_update)


def test_fused_admm_update_matches_ref():
    rng = np.random.RandomState(0)
    Kx = jnp.asarray(rng.randn(1, 3, 16, 128).astype(np.float32))
    u = jnp.asarray(rng.randn(1, 3, 16, 128).astype(np.float32))
    for kind in ("nonneg", "soft"):
        v_ref, u_ref = _admm_update_ref(Kx, u, 0.1, kind)
        v, unew = fused_admm_update(Kx, u, 0.1, kind)  # jnp fallback on CPU
        assert np.allclose(np.asarray(v), np.asarray(v_ref))
        assert np.allclose(np.asarray(unew), np.asarray(u_ref))


def test_freq_divide_matches_ref():
    rng = np.random.RandomState(1)
    F = jnp.asarray((rng.randn(1, 3, 16, 128) + 1j * rng.randn(1, 3, 16, 128)).astype(np.complex64))
    d = jnp.asarray(rng.rand(1, 3, 16, 128).astype(np.float32)) + 0.5
    out = freq_divide(F, d, 0.3)
    ref = _freq_divide_ref(F, d, 0.3)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bdot_matches():
    rng = np.random.RandomState(2)
    p = jnp.asarray(rng.randn(4, 3, 8, 128).astype(np.float32))
    q = jnp.asarray(rng.randn(4, 3, 8, 128).astype(np.float32))
    out = bdot_pallas(p, q)
    ref = jnp.sum(p.reshape(4, -1) * q.reshape(4, -1), axis=1)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
