"""Fast fused data-term proxes: closed-form correctness oracles."""
import numpy as np
import jax
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.proxfn.fast.sr import p2o, splits, upsample
from dprox_tpu.utils.fft import fft2_center, ifft2_center


def test_csmri_prox_solves_subproblem():
    # x = argmin 0.5||M F x - y||^2 + rho/2 ||x - v||^2 (checked by gradient)
    rng = np.random.RandomState(0)
    H = W = 16
    mask = (rng.rand(1, 1, H, W) > 0.5).astype(np.float32)
    gt = rng.rand(1, 1, H, W).astype(np.float32)
    y = jnp.asarray(mask) * fft2_center(jnp.asarray(gt))
    x = dp.Variable()
    fn = dp.csmri(x, dp.utils.array(mask), dp.utils.array(np.asarray(y)))
    v = jnp.asarray(rng.rand(1, 1, H, W).astype(np.float32))
    rho = 0.5
    out = fn.solve([v], jnp.asarray([rho]))
    # optimality: M^H(M F x - y) + rho (x - v) = 0 in Fourier domain
    Fx = fft2_center(out)
    grad = jnp.asarray(mask) * (jnp.asarray(mask) * Fx - y) + rho * (Fx - fft2_center(v.astype(jnp.complex64)))
    assert float(jnp.abs(grad).max()) < 1e-4


def test_sisr_prox_solves_subproblem():
    # closed form for min ||SHx - y||^2 + lam||x - v||^2 vs CG oracle
    rng = np.random.RandomState(1)
    sf = 2
    H = W = 16
    k = jnp.asarray(rng.rand(1, 1, 5, 5).astype(np.float32))
    k = k / jnp.sum(k)
    gt = jnp.asarray(rng.rand(1, 1, H, W).astype(np.float32))
    otf = p2o(k, (H, W))

    def Hop(x):
        return jnp.real(jnp.fft.ifftn(otf * jnp.fft.fftn(x, axes=(-2, -1)), axes=(-2, -1)))

    def Sop(x):
        return x[..., ::sf, ::sf]

    y = Sop(Hop(gt))
    x = dp.Variable()
    fn = dp.sisr(x, dp.utils.array(np.asarray(y)), dp.utils.array(np.asarray(k)), sf)
    v = jnp.asarray(rng.rand(1, 1, H, W).astype(np.float32))
    lam = 0.3
    out = fn.solve([v], jnp.asarray([lam]))

    # oracle: solve the normal equations (H^T S^T S H + lam I) x = rhs via CG
    def Ht(x):
        return jnp.real(jnp.fft.ifftn(jnp.conj(otf) * jnp.fft.fftn(x, axes=(-2, -1)), axes=(-2, -1)))

    def A(z):
        return Ht(upsample(Sop(Hop(z)), sf)) + lam * z

    from dprox_tpu.linalg import cg

    rhs = Ht(upsample(y, sf)) + lam * v
    oracle = cg(A, rhs, rtol=1e-10, max_iters=500)
    assert np.allclose(np.asarray(out), np.asarray(oracle), atol=1e-3)


def test_compress_sensing_prox():
    rng = np.random.RandomState(2)
    mask = jnp.asarray(rng.rand(1, 4, 8, 8).astype(np.float32))
    gt = jnp.asarray(rng.rand(1, 4, 8, 8).astype(np.float32))
    y = jnp.sum(gt * mask, axis=1, keepdims=True)
    x = dp.Variable()
    fn = dp.compress_sensing(x, dp.utils.array(np.asarray(mask)), dp.utils.array(np.asarray(y)))
    v = jnp.asarray(rng.rand(1, 4, 8, 8).astype(np.float32))
    rho = 0.7
    out = fn.solve([v], jnp.asarray([rho]))
    # optimality: A^T(A x - y) + rho (x - v) = 0
    Ax = jnp.sum(out * mask, axis=1, keepdims=True)
    grad = (Ax - y) * mask + rho * (out - v)
    assert float(jnp.abs(grad).max()) < 1e-4


def test_spi_inverse_finite():
    from dprox_tpu.proxfn.fast.spi import spi_forward, spi_inverse

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 1, 8, 8).astype(np.float32))
    K = 4
    ob = spi_forward(x, K, alpha=K, q=1, key=jax.random.key(0))
    assert ob.shape == (1, 1, 32, 32)
    K1 = jnp.asarray(rng.rand(1, 1, 8, 8).astype(np.float32)) * K * K
    out = spi_inverse(x, K1, float(K), 1.0)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_phase_ret_prox_runs():
    rng = np.random.RandomState(4)
    mask = jnp.asarray((rng.rand(1, 2, 8, 8) > 0.5).astype(np.float32) * 2 - 1).astype(jnp.complex64)
    gt = jnp.asarray(rng.rand(1, 1, 8, 8).astype(np.float32)).astype(jnp.complex64)
    from dprox_tpu.proxfn.fast.pr import cdp_forward

    y0 = jnp.abs(cdp_forward(gt, mask))
    x = dp.Variable()
    fn = dp.phase_ret(x, dp.utils.array(np.asarray(mask)), dp.utils.array(np.asarray(y0)))
    v = jnp.asarray(rng.rand(1, 1, 8, 8).astype(np.float32))
    out = fn._prox(v, jnp.asarray(0.5))
    assert out.shape == v.shape
    assert np.isfinite(np.asarray(out)).all()
