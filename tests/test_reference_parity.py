"""Numerical parity against the actual reference implementation.

These tests import /root/reference/dprox (PyTorch, CPU) through
reference_harness and compare outputs on IDENTICAL inputs — linop
forward/adjoint, the freq-diagonal least-squares x-update, schedules,
the csmri fused prox, and full multi-iteration ADMM solves. Tolerances
are f32 round-off level.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import dprox_tpu as dtp
from reference_harness import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")

if ref is not None:
    import torch


def t(x):
    return torch.from_numpy(np.asarray(x))


RNG = np.random.RandomState(0)
IMG = RNG.rand(1, 3, 32, 32).astype(np.float32)
PSF = RNG.rand(5, 5).astype(np.float32)
PSF /= PSF.sum()


class TestLinopParity:
    def test_conv_forward_adjoint(self):
        xr = ref.Variable()
        op_r = ref.conv(xr, PSF)
        out_r = op_r.forward(t(IMG)).numpy()
        adj_r = op_r.adjoint(t(IMG)).numpy()

        xj = dtp.Variable()
        op_j = dtp.conv(xj, PSF)
        out_j = np.asarray(dtp.linop.eval(op_j, jnp.asarray(IMG)))
        adj_j = np.asarray(dtp.linop.adjoint(op_j, jnp.asarray(IMG)))
        assert np.allclose(out_j, out_r, atol=2e-5)
        assert np.allclose(adj_j, adj_r, atol=2e-5)

    def test_grad_op(self):
        for dim in (0, 1):
            xr = ref.Variable()
            out_r = ref.grad(xr, dim).forward(t(IMG)).numpy()
            xj = dtp.Variable()
            out_j = np.asarray(dtp.linop.eval(dtp.grad(xj, dim), jnp.asarray(IMG)))
            assert np.allclose(out_j, out_r, atol=2e-5), f"dim={dim}"

    def test_mosaic_op(self):
        xr = ref.Variable()
        out_r = ref.mosaic(xr).forward(t(IMG)).numpy()
        xj = dtp.Variable()
        out_j = np.asarray(dtp.linop.eval(dtp.mosaic(xj), jnp.asarray(IMG)))
        assert np.allclose(out_j, out_r, atol=1e-6)

    def test_conv_gram_diag(self):
        xr = ref.Variable()
        op_r = ref.conv(xr, PSF)
        diag_r = op_r.get_diag(t(IMG), freq=True).numpy()
        xj = dtp.Variable()
        diag_j = np.asarray(dtp.conv(xj, PSF).gram_diag(IMG.shape, freq=True))
        assert np.allclose(diag_j, diag_r, atol=2e-5)


class TestScheduleParity:
    def test_log_descent(self):
        r_ref, s_ref = ref.log_descent(35, 10, 24)
        r_j, s_j = dtp.log_descent(35, 10, 24)
        assert np.allclose(np.asarray(r_j), r_ref.numpy(), rtol=1e-5)
        assert np.allclose(np.asarray(s_j), s_ref.numpy(), rtol=1e-5)


class TestSolveParity:
    def _problem_ref(self, b):
        x = ref.Variable()
        data = ref.sum_squares(ref.conv(x, PSF) - t(b))
        reg = ref.nonneg(x)
        return ref.compile(data + reg, method="admm", device="cpu")

    def _problem_jax(self, b):
        x = dtp.Variable()
        data = dtp.sum_squares(dtp.conv(x, PSF) - dtp.utils.array(b))
        reg = dtp.nonneg(x)
        return dtp.compile(data + reg, method="admm")

    def test_admm_full_solve(self):
        blurred = ref.conv(ref.Variable(), PSF).forward(t(IMG)).numpy()
        s_ref = self._problem_ref(blurred)
        with torch.no_grad():
            out_r = s_ref.solve(x0=t(blurred), rhos=0.1, lams=0.05,
                                max_iter=5).numpy()
        s_jax = self._problem_jax(blurred)
        out_j = np.asarray(s_jax.solve(x0=blurred, rhos=0.1, lams=0.05,
                                       max_iter=5))
        assert np.allclose(out_j, out_r, atol=5e-4), np.abs(out_j - out_r).max()

    @pytest.mark.parametrize("method", ["admm", "hqs", "admm_vxu"])
    def test_methods_parity(self, method):
        blurred = ref.conv(ref.Variable(), PSF).forward(t(IMG)).numpy()
        x = ref.Variable()
        data = ref.sum_squares(ref.conv(x, PSF) - t(blurred))
        reg = ref.nonneg(x)
        s_ref = ref.compile(data + reg, method=method, device="cpu")
        with torch.no_grad():
            out_r = s_ref.solve(x0=t(blurred), rhos=0.2, lams=0.1,
                                max_iter=4).numpy()

        xj = dtp.Variable()
        data_j = dtp.sum_squares(dtp.conv(xj, PSF) - dtp.utils.array(blurred))
        reg_j = dtp.nonneg(xj)
        s_jax = dtp.compile(data_j + reg_j, method=method)
        out_j = np.asarray(s_jax.solve(x0=blurred, rhos=0.2, lams=0.1,
                                       max_iter=4))
        assert np.allclose(out_j, out_r, atol=5e-4), (
            method, np.abs(out_j - out_r).max())


class TestPnPSolveParity:
    """End-to-end PnP-ADMM with a DEEP prior: the reference's deep_prior
    (prior.py:43-91) vs dprox_tpu's, both running the SAME FFDNet weights
    (seeded torch net -> saved .pth -> each side's own load path). This
    is the flagship-config proof (BASELINE configs[1]): 5 full ADMM
    iterations with the denoiser in the loop must agree to f32 level."""

    def _make_ckpt(self, tmp_path):
        from dprox.proxfn.pnp.denoisers.models.network_ffdnet import \
            FFDNet as TorchFFDNet

        torch.manual_seed(21)
        tnet = TorchFFDNet(in_nc=1, out_nc=1, nc=64, nb=15, act_mode="R")
        with torch.no_grad():
            # tame random-init activations so 5 PnP iterations stay
            # bounded (both sides see identical weights either way)
            for prm in tnet.parameters():
                prm.mul_(0.25)
        path = str(tmp_path / "ffdnet_rand.pth")
        torch.save(tnet.state_dict(), path)
        return path

    def test_deep_prior_admm_solve(self, tmp_path):
        from dprox.proxfn.pnp.denoisers.wrapper import \
            FFDNetDenoiser as RefFFDNetDenoiser

        from dprox_tpu.proxfn.pnp.denoisers import FFDNetDenoiser

        ckpt = self._make_ckpt(tmp_path)
        img = RNG.rand(1, 1, 32, 32).astype(np.float32)
        blurred = ref.conv(ref.Variable(), PSF).forward(t(img)).numpy()

        xr = ref.Variable()
        prior_r = ref.deep_prior(xr, RefFFDNetDenoiser(ckpt))
        data_r = ref.sum_squares(ref.conv(xr, PSF) - t(blurred))
        s_ref = ref.compile(data_r + prior_r, method="admm", device="cpu")
        with torch.no_grad():
            out_r = s_ref.solve(x0=t(blurred), rhos=0.1, lams=0.05,
                                max_iter=5).numpy()

        xj = dtp.Variable()
        prior_j = dtp.deep_prior(xj, FFDNetDenoiser(ckpt_path=ckpt))
        data_j = dtp.sum_squares(dtp.conv(xj, PSF) - dtp.utils.array(blurred))
        s_jax = dtp.compile(data_j + prior_j, method="admm")
        out_j = np.asarray(s_jax.solve(x0=blurred, rhos=0.1, lams=0.05,
                                       max_iter=5))
        err = np.abs(out_j - out_r).max()
        assert err < 5e-4, err

    def test_deep_prior_multichannel_sqrt(self, tmp_path):
        """Color input through the band-looped Denoiser2D + sqrt(lam)
        schedule (prior.py:79-86). x8 is deliberately NOT parity-tested:
        the reference Augment cycles ONE dihedral transform per call with
        mutable counter state (composite.py:12-28), while dprox_tpu's
        Augment is the pure averaged 8-transform ensemble — a documented
        TPU-first redesign (denoisers.py Augment docstring), so the two
        compute different (both valid) functions per iteration."""
        from dprox.proxfn.pnp.denoisers.wrapper import \
            FFDNetDenoiser as RefFFDNetDenoiser

        from dprox_tpu.proxfn.pnp.denoisers import FFDNetDenoiser

        ckpt = self._make_ckpt(tmp_path)
        blurred = ref.conv(ref.Variable(), PSF).forward(t(IMG)).numpy()

        xr = ref.Variable()
        prior_r = ref.deep_prior(xr, RefFFDNetDenoiser(ckpt), sqrt=True)
        data_r = ref.sum_squares(ref.conv(xr, PSF) - t(blurred))
        s_ref = ref.compile(data_r + prior_r, method="admm", device="cpu")
        with torch.no_grad():
            out_r = s_ref.solve(x0=t(blurred), rhos=0.1, lams=0.02,
                                max_iter=3).numpy()

        xj = dtp.Variable()
        prior_j = dtp.deep_prior(xj, FFDNetDenoiser(ckpt_path=ckpt),
                                 sqrt=True)
        data_j = dtp.sum_squares(dtp.conv(xj, PSF) - dtp.utils.array(blurred))
        s_jax = dtp.compile(data_j + prior_j, method="admm")
        out_j = np.asarray(s_jax.solve(x0=blurred, rhos=0.1, lams=0.02,
                                       max_iter=3))
        err = np.abs(out_j - out_r).max()
        assert err < 5e-4, err


class TestCsmriParity:
    def test_csmri_fused_prox(self):
        rng = np.random.RandomState(3)
        mask = (rng.rand(1, 1, 16, 16) > 0.5)
        y = (rng.randn(1, 1, 16, 16) + 1j * rng.randn(1, 1, 16, 16)).astype(np.complex64)
        y = np.where(mask, y, 0)
        v = rng.rand(1, 1, 16, 16).astype(np.float32)
        rho = 0.7

        x = ref.Variable()
        fn_r = ref.csmri(x, torch.from_numpy(mask), torch.from_numpy(y))
        out_r = fn_r._prox(t(v).to(torch.complex64),
                           torch.tensor([rho]), 1).numpy()

        xj = dtp.Variable()
        fn_j = dtp.csmri(xj, dtp.utils.array(mask), dtp.utils.array(y))
        out_j = np.asarray(fn_j.solve([jnp.asarray(v).astype(jnp.complex64)],
                                      jnp.asarray([rho])))
        assert np.allclose(out_j, out_r, atol=2e-5), np.abs(out_j - out_r).max()


class TestProxParity:
    def test_norm1_prox_with_modifiers(self):
        rng = np.random.RandomState(4)
        v = rng.randn(1, 3, 8, 8).astype(np.float32)
        lam = 0.3

        x = ref.Variable()
        x.value = torch.zeros(1, 3, 8, 8)  # offset extraction needs a value
        fn_r = ref.norm1(2.0 * ref.grad(x, 0))  # scale absorbed into beta
        from dprox.algo.opt.absorb import absorb_all_linops as ref_absorb

        fn_r = ref_absorb([fn_r])[0]
        out_r = fn_r.prox(t(v), torch.tensor([lam])).numpy()

        xj = dtp.Variable()
        fn_j = dtp.norm1(2.0 * dtp.grad(xj, 0))
        fn_j = dtp.algo.absorb_all_linops([fn_j])[0]
        out_j = np.asarray(fn_j.prox(jnp.asarray(v), lam))
        assert np.allclose(out_j, out_r, atol=1e-5)


class TestMoreSolverParity:
    def test_ladmm_parity(self):
        blurred = ref.conv(ref.Variable(), PSF).forward(t(IMG)).numpy()
        x = ref.Variable()
        data = ref.sum_squares(ref.conv(x, PSF) - t(blurred))
        reg = ref.nonneg(x)
        s_ref = ref.compile(data + reg, method="ladmm", device="cpu")
        with torch.no_grad():
            out_r = s_ref.solve(x0=t(blurred), rhos=0.2, lams=0.1,
                                max_iter=4).numpy()
        xj = dtp.Variable()
        data_j = dtp.sum_squares(dtp.conv(xj, PSF) - dtp.utils.array(blurred))
        s_jax = dtp.compile(data_j + dtp.nonneg(xj), method="ladmm")
        out_j = np.asarray(s_jax.solve(x0=blurred, rhos=0.2, lams=0.1,
                                       max_iter=4))
        assert np.allclose(out_j, out_r, atol=5e-4), np.abs(out_j - out_r).max()

    def test_pgd_parity(self):
        blurred = ref.conv(ref.Variable(), PSF).forward(t(IMG)).numpy()
        x = ref.Variable()
        data = ref.sum_squares(ref.conv(x, PSF) - t(blurred))
        reg = ref.nonneg(x)
        s_ref = ref.compile(data + reg, method="pgd", device="cpu")
        with torch.no_grad():
            out_r = s_ref.solve(x0=t(blurred), rhos=0.4, lams=0.1,
                                max_iter=4).numpy()
        xj = dtp.Variable()
        data_j = dtp.sum_squares(dtp.conv(xj, PSF) - dtp.utils.array(blurred))
        s_jax = dtp.compile(data_j + dtp.nonneg(xj), method="pgd")
        out_j = np.asarray(s_jax.solve(x0=blurred, rhos=0.4, lams=0.1,
                                       max_iter=4))
        assert np.allclose(out_j, out_r, atol=5e-4), np.abs(out_j - out_r).max()

    def test_weighted_sum_squares_mosaic_absorb(self):
        """NOTE: the reference's own absorb->weighted_sum_squares path is
        broken for mosaic (mosaic defines is_self_diag/is_gram_diag but
        not is_diag, so weighted_sum_squares.__init__ raises
        "weight mosaic must be diagonalizable", sum_square.py:56-64).
        Verified against the analytic prox instead:
        argmin ||Mx-b||^2 + 1/(2 lam)||x-v||^2 = (2 lam M^T b + v)/(2 lam M + 1)
        with the reference convention prox(v, lam) using lam scaling."""
        rng = np.random.RandomState(7)
        b = rng.rand(1, 3, 16, 16).astype(np.float32)
        v = rng.rand(1, 3, 16, 16).astype(np.float32)
        lam = 0.4

        xj = dtp.Variable()
        fn_j = dtp.sum_squares(dtp.mosaic(xj), b=dtp.utils.array(b))
        fn_j = dtp.algo.absorb_all_linops([fn_j])[0]
        assert isinstance(fn_j, dtp.weighted_sum_squares)
        out_j = np.asarray(fn_j.prox(jnp.asarray(v), lam))
        # our weighted_sum_squares._prox: (Ktb + lam*v)/(diag + lam)
        from dprox_tpu.utils.imaging import bayer_mask

        mask = bayer_mask((16, 16))
        expect = (mask * b + lam * v) / (mask + lam)
        assert np.allclose(out_j, expect, atol=1e-5), np.abs(out_j - expect).max()

    def test_cg_path_jd_parity(self):
        """Joint demosaic-deconv: the non-diagonalizable CG x-update,
        converged tight on both sides (reference tests/problem/test_jd23)."""
        from dprox.linalg import LinearSolveConfig as RefCfg

        rng = np.random.RandomState(8)
        img = rng.rand(1, 3, 16, 16).astype(np.float32)
        x = ref.Variable()
        Kop = ref.mosaic(ref.conv(x, PSF))
        b = Kop.forward(t(img)).numpy()

        data = ref.sum_squares(ref.mosaic(ref.conv(x, PSF)) - t(b))
        reg = ref.nonneg(x)
        s_ref = ref.compile(data + reg, method="admm", device="cpu",
                            linear_solve_config=RefCfg(rtol=1e-10, max_iters=300))
        with torch.no_grad():
            out_r = s_ref.solve(x0=t(b), rhos=0.3, lams=0.1, max_iter=3).numpy()

        xj = dtp.Variable()
        data_j = dtp.sum_squares(dtp.mosaic(dtp.conv(xj, PSF)) - dtp.utils.array(b))
        s_jax = dtp.compile(data_j + dtp.nonneg(xj), method="admm",
                            linear_solve_config=dtp.LinearSolveConfig(rtol=1e-10, max_iters=300))
        assert not s_jax.least_square.freq_diagonalizable
        out_j = np.asarray(s_jax.solve(x0=b, rhos=0.3, lams=0.1, max_iter=3))
        assert np.allclose(out_j, out_r, atol=1e-3), np.abs(out_j - out_r).max()


class TestOpsParityExtra:
    def test_conv_doe_circular_and_linear(self):
        psf = RNG.rand(1, 3, 7, 7).astype(np.float32)
        psf /= psf.sum()
        for circular in (True, False):
            x = ref.Variable()
            op_r = ref.conv_doe(x, psf=torch.from_numpy(psf), circular=circular)
            with torch.no_grad():
                out_r = op_r.forward(t(IMG)).numpy()
                adj_r = op_r.adjoint(t(IMG)).numpy()

            xj = dtp.Variable()
            op_j = dtp.conv_doe(xj, psf, circular=circular)
            out_j = np.asarray(dtp.linop.eval(op_j, jnp.asarray(IMG)))
            adj_j = np.asarray(dtp.linop.adjoint(op_j, jnp.asarray(IMG)))
            assert np.allclose(out_j, out_r, atol=2e-5), (circular, np.abs(out_j - out_r).max())
            assert np.allclose(adj_j, adj_r, atol=2e-5), circular

    def test_mul_color(self):
        srf = RNG.rand(8, 3).astype(np.float32)
        xm = RNG.rand(1, 8, 8, 8).astype(np.float32)
        from dprox.linop.mul import mul_color as ref_mul_color
        from dprox.linop import Placeholder as RefPlaceholder

        # NOTE: the reference's mul_color batchifies a raw srf into
        # [1,C,C2] and then srf.T @ x fails — only the Placeholder path
        # (which skips batchify, mul.py:23-26) is functional; use it.
        x = ref.Variable()
        ph = RefPlaceholder()
        op_r = ref_mul_color(x, ph)
        ph.value = torch.from_numpy(srf)
        with torch.no_grad():
            out_r = op_r.forward(t(xm)).numpy()

        xj = dtp.Variable()
        op_j = dtp.mul_color(xj, srf)
        out_j = np.asarray(dtp.linop.eval(op_j, jnp.asarray(xm)))
        assert np.allclose(out_j, out_r, atol=1e-5)

    def test_mul_elementwise(self):
        w = RNG.rand(1, 3, 32, 32).astype(np.float32)
        from dprox.linop.mul import mul_elementwise as ref_mul_ew

        x = ref.Variable()
        op_r = ref_mul_ew(x, torch.from_numpy(w))
        with torch.no_grad():
            out_r = op_r.forward(t(IMG)).numpy()

        xj = dtp.Variable()
        out_j = np.asarray(dtp.linop.eval(dtp.mul_elementwise(xj, w), jnp.asarray(IMG)))
        assert np.allclose(out_j, out_r, atol=1e-6)

    def test_scale_and_sum_expression(self):
        x = ref.Variable()
        expr_r = 2.0 * ref.conv(x, PSF) + ref.grad(x, 0)
        from dprox.linop import eval as ref_eval

        out_r = ref_eval(expr_r, t(IMG)).numpy()

        xj = dtp.Variable()
        expr_j = 2.0 * dtp.conv(xj, PSF) + dtp.grad(xj, 0)
        out_j = np.asarray(dtp.linop.eval(expr_j, jnp.asarray(IMG)))
        assert np.allclose(out_j, out_r, atol=2e-5)

    def test_nlm_denoiser(self):
        from dprox.proxfn.nlm.nlm import NonLocalMeansFast

        v = RNG.rand(1, 3, 24, 24).astype(np.float32)
        sig = 0.1
        with torch.no_grad():
            out_r = NonLocalMeansFast()(t(v), torch.tensor(sig)).numpy()
        from dprox_tpu.proxfn.nlm import nlm_denoise

        out_j = np.asarray(nlm_denoise(jnp.asarray(v), sig))
        assert np.allclose(out_j, out_r, atol=1e-4), np.abs(out_j - out_r).max()

    def test_tv_denoising_iterations(self):
        from dprox.proxfn.pnp.denoisers.models.TV_denoising import TV_denoising

        y = RNG.rand(16, 16, 3).astype(np.float32)
        with torch.no_grad():
            out_r = TV_denoising(t(y), torch.tensor(0.1), 20).numpy()
        from dprox_tpu.models.tv import tv_denoising

        out_j = np.asarray(tv_denoising(jnp.asarray(y), 0.1, 20))
        assert np.allclose(out_j, out_r, atol=1e-5), np.abs(out_j - out_r).max()


class TestDEQSolveParity:
    """Deep-equilibrium solve vs the reference DEQSolver
    (/root/reference/dprox/algo/specialization/deq/solver.py:57-109).

    Both sides wrap one ADMM iteration of the same deconv+nonneg problem
    as a fixed-point map and run Anderson acceleration on the packed
    state. The primary assertion is PAIRWISE: the two implementations'
    outputs agree to 5e-3 — i.e. dprox_tpu's anderson (m=6, lam=1e-4)
    tracks the reference trajectory (solvers.py:193-243), not just the
    limit. The reference stops at rel residual 1e-3 of the packed-state
    norm, which for this slowly-contracting ADMM map leaves ~0.2 max
    distance to the true fixed point (measured; a property of the
    reference's stopping rule, not of either implementation) — so the
    vs-truth check is at that documented looser level."""

    def test_deq_admm_fixed_point_parity(self):
        from dprox.algo.specialization.deq.solver import \
            DEQSolver as RefDEQSolver

        blurred = ref.conv(ref.Variable(), PSF).forward(t(IMG)).numpy()

        # reference side
        x = ref.Variable()
        data = ref.sum_squares(ref.conv(x, PSF) - t(blurred))
        reg = ref.nonneg(x)
        inner_r = ref.compile(data + reg, method="admm", device="cpu")
        s_ref = RefDEQSolver(inner_r).eval()
        with torch.no_grad():
            out_r = s_ref.solve(x0=t(blurred), rhos=0.3, lams=0.1).numpy()

        # dprox_tpu side
        from dprox_tpu.algo.special import DEQSolver

        xj = dtp.Variable()
        data_j = dtp.sum_squares(dtp.conv(xj, PSF) - dtp.utils.array(blurred))
        reg_j = dtp.nonneg(xj)
        inner_j = dtp.compile(data_j + reg_j, method="admm")
        s_jax = DEQSolver(inner_j, f_thres=40, b_thres=40)
        out_j = np.asarray(s_jax.solve(x0=blurred, rhos=0.3, lams=0.1))

        # ground-truth fixed point: long plain ADMM at the same (rho, lam)
        with torch.no_grad():
            x_star = inner_r.solve(x0=t(blurred), rhos=0.3, lams=0.1,
                                   max_iter=300).numpy()

        assert np.abs(out_j - out_r).max() < 5e-3, np.abs(out_j - out_r).max()
        # Anderson-stopping-level proximity to the true fixed point
        # (both sides converge TOWARD x*, within the reference's rel-1e-3
        # packed-state stopping slack), and both improve on x0.
        assert np.abs(out_r - x_star).max() < 0.3, np.abs(out_r - x_star).max()
        assert np.abs(out_j - x_star).max() < 0.3, np.abs(out_j - x_star).max()
        err0 = np.mean((blurred - x_star) ** 2)
        assert np.mean((out_r - x_star) ** 2) < 0.5 * err0
        assert np.mean((out_j - x_star) ** 2) < 0.5 * err0
