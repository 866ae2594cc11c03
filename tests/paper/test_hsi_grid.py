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


def _solve(data_term, x0, reg, iters=24):
    solver = dp.compile([data_term, reg], method="admm")
    rhos, sigmas = dp.log_descent(35, 10, iters)
    out = solver.solve(x0=x0, rhos=rhos, lams=sigmas, max_iter=iters)
    return np.asarray(jnp.real(out))


def _mpsnr(out, gt):
    def hwc(t):
        return np.transpose(np.asarray(t)[0], (1, 2, 0))

    return metrics.mpsnr(hwc(out), hwc(gt))


def _task(name, prior_kind):
    gt, srf = _cube()
    B = gt.shape[1]
    rng = np.random.RandomState(0)
    x = dp.Variable()
    reg = _prior(x, prior_kind)
    if name == "deblur":
        psf = imaging.point_spread_function(9, 2)
        b = imaging.blurring(gt, psf)
        return _solve(dp.sum_squares(dp.conv(x, psf) - b), b, reg), gt
    if name == "sisr":
        psf = imaging.point_spread_function(7, 2)
        y, x0 = imaging.downsampling(gt, psf, 2)
        kernel = np.transpose(psf, (2, 0, 1))[None]
        return _solve(dp.sisr(x, dp.utils.array(np.asarray(y)),
                              dp.utils.array(kernel), 2), x0, reg), gt
    if name == "misr":
        z = np.asarray(gt).reshape(1, B, -1)
        b = np.einsum("ck,nkp->ncp", srf.T, z).reshape(1, 3, *gt.shape[2:])
        x0 = jnp.asarray(np.repeat(b.mean(1, keepdims=True), B, axis=1))
        return _solve(dp.misr(x, dp.utils.array(b), srf), x0, reg), gt
    if name == "cs":
        mask = (rng.rand(1, B, *gt.shape[2:]) > 0.5).astype(np.float32)
        y = np.sum(np.asarray(gt) * mask, axis=1, keepdims=True)
        x0 = jnp.asarray(np.repeat(y / max(B // 2, 1), B, axis=1))
        return _solve(dp.compress_sensing(x, dp.utils.array(mask),
                                          dp.utils.array(y)), x0, reg), gt
    raise KeyError(name)


# (task, trained-deep-prior mPSNR golden, 3-D TV mPSNR golden).
# TV column measured (CPU, deterministic); deep column pending the r4b
# low-sigma-emphasis retrain — None = skip until pinned.
HSI_GRID = [
    ("deblur", None, 31.21),
    ("sisr", None, 30.63),
    ("misr", None, 48.40),
    ("cs", None, 30.85),
]


@needs_weights
@pytest.mark.parametrize("task,expected,expected_tv", HSI_GRID)
def test_hsi_deep_prior_beats_tv(task, expected, expected_tv):
    if expected is None:
        pytest.skip("deep-prior golden not yet pinned (retrain running)")
    out_tv, gt = _task(task, "tv3d")
    p_tv = _mpsnr(out_tv, gt)
    out_dp, _ = _task(task, "tiny_grunet")
    p_dp = _mpsnr(out_dp, gt)
    assert p_tv == pytest.approx(expected_tv, abs=0.2), p_tv
    assert p_dp == pytest.approx(expected, abs=0.2), p_dp
    assert p_dp > p_tv, (p_dp, p_tv)
