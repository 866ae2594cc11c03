"""HSI restoration quality grid: the trained 3-D deep prior
(tiny_grunet, weights/tiny_grunet.msgpack) vs 3-D TV across the suite's
tasks (VERDICT r3 next #2 — the reference's dphsir pillar runs PnP with
a pretrained GRUNet at 54-55 dB mPSNR on real cubes,
/root/reference/examples/papers/dphsir_neurcomputing_2022/hsi_deblur.py:44;
those weights/datasets are egress-blocked, so this grid pins goldens on
the deterministic synthetic cube of examples/papers/hsi_suite.py).
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.proxfn.pnp.denoisers import TVDenoiser
from dprox_tpu.proxfn.pnp.hub import find_weights
from dprox_tpu.utils import imaging, metrics

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

needs_weights = pytest.mark.skipif(
    find_weights("tiny_grunet.msgpack") is None,
    reason="tiny_grunet weights not shipped")


def _cube(bands=8, size=64):
    from examples.papers.hsi_suite import synthetic_hsi

    cube, srf = synthetic_hsi(bands, size)
    return jnp.asarray(cube), srf


def _prior(x, kind):
    if kind == "tv3d":
        return dp.deep_prior(x, TVDenoiser(iter_num=10, use_3dtv=True),
                             sqrt=True)
    return dp.deep_prior(x, kind, sqrt=True)


def _solve(data_term, x0, reg, iters=24, sigma_n=0.0):
    solver = dp.compile([data_term, reg], method="admm")
    # DPIR rule: the measurement noise enters both the sigma descent
    # floor and the rho scaling (cf. tests/paper/test_csmri_grid.py)
    if sigma_n > 0:
        rhos, sigmas = dp.log_descent(35 + 300 * sigma_n, 10 + 200 * sigma_n,
                                      iters, sigma=sigma_n)
    else:
        rhos, sigmas = dp.log_descent(35, 10, iters)
    out = solver.solve(x0=x0, rhos=rhos, lams=sigmas, max_iter=iters)
    return np.asarray(jnp.real(out))


def _mpsnr(out, gt):
    def hwc(t):
        return np.transpose(np.asarray(t)[0], (1, 2, 0))

    return metrics.mpsnr(hwc(out), hwc(gt))


def _task(name, prior_kind, sigma_n=0.05):
    """Noisy measurement versions of the suite tasks — the regime the
    reference's dphsir deep priors target (their training degradations
    carry noise); noiseless easy data terms are data-limited and TV
    saturates them (misr hits 48 dB with ANY gentle prior)."""
    gt, srf = _cube()
    B = gt.shape[1]
    rng = np.random.RandomState(0)

    def noisy(arr, scale=sigma_n):
        a = np.asarray(arr)
        return (a + scale * np.random.RandomState(5)
                .randn(*a.shape)).astype(np.float32)

    x = dp.Variable()
    reg = _prior(x, prior_kind)
    if name == "deblur":
        psf = imaging.point_spread_function(9, 2)
        b = jnp.asarray(noisy(imaging.blurring(gt, psf)))
        return _solve(dp.sum_squares(dp.conv(x, psf) - b), b, reg,
                      sigma_n=sigma_n), gt
    if name == "sisr":
        psf = imaging.point_spread_function(7, 2)
        y, x0 = imaging.downsampling(gt, psf, 2)
        y = noisy(y)
        kernel = np.transpose(psf, (2, 0, 1))[None]
        x0 = jnp.asarray(noisy(np.asarray(x0)))
        return _solve(dp.sisr(x, dp.utils.array(y),
                              dp.utils.array(kernel), 2), x0, reg,
                      sigma_n=sigma_n), gt
    if name == "misr":
        z = np.asarray(gt).reshape(1, B, -1)
        b = np.einsum("ck,nkp->ncp", srf.T, z).reshape(1, 3, *gt.shape[2:])
        b = noisy(b)
        x0 = jnp.asarray(np.repeat(b.mean(1, keepdims=True), B, axis=1))
        return _solve(dp.misr(x, dp.utils.array(b), srf), x0, reg,
                      sigma_n=sigma_n), gt
    if name == "cs":
        mask = (rng.rand(1, B, *gt.shape[2:]) > 0.5).astype(np.float32)
        y = noisy(np.sum(np.asarray(gt) * mask, axis=1, keepdims=True))
        x0 = jnp.asarray(np.repeat(y / max(B // 2, 1), B, axis=1))
        return _solve(dp.compress_sensing(x, dp.utils.array(mask),
                                          dp.utils.array(y)), x0, reg,
                      sigma_n=sigma_n), gt
    raise KeyError(name)


# (task, deep-prior registry key, deep mPSNR golden, 3-D TV mPSNR
# golden) — pinned r4 from the 12k-step low-sigma-emphasis warm retrain
# (weights/README.md). Per-task prior choice mirrors the reference's
# per-task denoiser configs (dphsir examples); the trained deep prior
# beats 3-D TV on EVERY task — misr needs the 3-D-TV blend
# (tiny_grunet_tv) because the tiny net underfits the very high
# (>32 dB) fidelity the 8->3-band fusion data term sustains.
HSI_GRID = [
    ("deblur", "tiny_grunet", 29.51, 27.28),
    ("sisr", "tiny_grunet", 29.32, 26.70),
    ("misr", "tiny_grunet_tv", 34.57, 31.92),
    ("cs", "tiny_grunet", 30.35, 30.21),
]


@needs_weights
@pytest.mark.parametrize("task,prior,expected,expected_tv", HSI_GRID)
def test_hsi_deep_prior_beats_tv(task, prior, expected, expected_tv):
    out_tv, gt = _task(task, "tv3d")
    p_tv = _mpsnr(out_tv, gt)
    out_dp, _ = _task(task, prior)
    p_dp = _mpsnr(out_dp, gt)
    assert p_tv == pytest.approx(expected_tv, abs=0.2), p_tv
    assert p_dp == pytest.approx(expected, abs=0.2), p_dp
    assert p_dp > p_tv, (p_dp, p_tv)


@pytest.mark.skipif(find_weights("mid_grunet.msgpack") is None,
                    reason="mid_grunet weights not shipped")
def test_mid_grunet_fidelity_beats_tiny():
    """r5 capacity curve (VERDICT r4 #5): the wider base=12 GRUNet
    lifts standalone denoising fidelity over tiny (heldout: 39.82 vs
    37.79 dB at sigma=0.01) — while the GRID stays pinned on tiny
    because the grid tasks are NOT fidelity-limited (misr-alone gets
    worse with the stronger denoiser; measured negative recorded in
    weights/README.md)."""
    from dprox_tpu.proxfn.pnp.prior import get_denoiser

    gt, _ = _cube()
    rng = np.random.RandomState(3)
    noisy = np.asarray(gt) + 0.03 * rng.randn(*gt.shape).astype(np.float32)
    scores = {}
    for kind in ("tiny_grunet", "mid_grunet"):
        den = get_denoiser(kind)
        out = den.denoise(jnp.asarray(noisy), 0.03)
        scores[kind] = _mpsnr(np.asarray(out), gt)
    assert scores["mid_grunet"] > scores["tiny_grunet"], scores
