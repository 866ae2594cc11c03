"""Problem-level integration tests (mirrors the reference's
tests/problem/test_inverse_problems.py + test_jd23.py tier structure,
with offline-deterministic data and goldens where applicable)."""
import numpy as np
import jax.numpy as jnp
import pytest

import dprox_tpu as dp
from dprox_tpu.contrib import csmri
from dprox_tpu.utils import imaging, metrics


def test_deconv_problem_api():
    img = imaging.sample("face")[:, :, :128, :128]
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    prob = dp.Problem(dp.sum_squares(dp.conv(x, psf) - b) + dp.deep_prior(x, "tv"))
    rhos, sigmas = dp.log_descent(35, 10, 24)
    out = prob.solve(method="admm", x0=b, rhos=rhos, lams=sigmas, max_iter=24)
    assert metrics.psnr(out, img) > metrics.psnr(b, img) + 2.0


def test_csmri_problem():
    s = csmri.generate_sample(size=128, num_lines=40)
    x = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    solver = dp.compile(dp.csmri(x, mask, y) + dp.deep_prior(x, "tv", sqrt=True),
                        method="admm")
    rhos, sigmas = dp.log_descent(30, 5, 24, sigma=0.01)
    out = solver.solve(x0=s["x0"], rhos=rhos, lams=sigmas, max_iter=24,
                       params=s["params"], real_output=True)
    assert metrics.psnr(np.asarray(out), s["gt"]) > 25.0


def test_jd_cg_path_batched():
    """Joint demosaic+deconv (CG path) incl. the B=2 batched variant
    (reference: tests/problem/test_jd23.py:39-63)."""
    img = imaging.sample("face")[:, :, :64, :64]
    psf = imaging.point_spread_function(9, 2)
    blurred = imaging.blurring(img, psf)
    b = imaging.mosaicing(blurred)
    x = dp.Variable()
    data = dp.sum_squares(dp.mosaic(dp.conv(x, psf)) - dp.Placeholder("b"))
    reg = dp.deep_prior(x, "tv")
    solver = dp.compile(data + reg, method="admm",
                        linear_solve_config=dp.LinearSolveConfig(max_iters=40))
    assert not solver.least_square.freq_diagonalizable

    init = dp.utils.demosaic_from_mosaiced(b)
    rhos, sigmas = dp.log_descent(35, 10, 5)
    out1 = solver.solve(x0=init, rhos=rhos, lams=sigmas, max_iter=5,
                        params={"b": b})
    assert metrics.psnr(out1, img) > metrics.psnr(b, img) + 5.0

    b2 = jnp.concatenate([b, b], axis=0)
    init2 = jnp.concatenate([init, init], axis=0)
    out2 = solver.solve(x0=init2, rhos=rhos, lams=sigmas, max_iter=5,
                        params={"b": b2})
    assert out2.shape[0] == 2
    assert np.allclose(np.asarray(out2[0]), np.asarray(out1[0]), atol=1e-3)


def test_weighted_sum_squares_freq_path():
    """wss with a frequency-diagonal weight (conv) exercises _prox_freq
    (reference: sum_square.py:79-83)."""
    rng = np.random.RandomState(0)
    x = dp.Variable()
    psf = imaging.fspecial_gaussian(5, 1.5)
    K = dp.conv(x, psf)
    gt = jnp.asarray(rng.rand(1, 1, 16, 16).astype(np.float32))
    b = dp.linop.eval(K, gt)
    fn = dp.weighted_sum_squares(x, K, dp.utils.array(np.asarray(b)))
    assert fn.freq
    v = jnp.asarray(rng.rand(1, 1, 16, 16).astype(np.float32))
    lam = 0.5
    out = fn.prox(v, lam)
    # optimality: K^T(K x - b) + lam/... -> grad check:
    # argmin ||Kx-b||^2 + (lam/2)||x - v||^2? our _prox_freq solves
    # (K^TK + lam)^-1 (K^T b + lam v)
    KtK_out = dp.linop.adjoint(K, dp.linop.eval(K, out))
    Ktb = dp.linop.adjoint(K, b)
    resid = KtK_out + lam * out - (Ktb + lam * v)
    assert float(jnp.abs(resid).max()) < 1e-4
