"""End-to-end solver tests.

Mirrors /root/reference/tests/test_algorithms.py (structure) and
tests/problem/test_ml_problems.py (exact closed-form checks, the only
CPU-friendly oracle in the reference): a deconvolution problem is solved
by admm/ladmm/admm_vxu/hqs/pc/pgd and checked for PSNR improvement, and
tiny exact least-squares problems are checked against their analytic
solutions.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dprox_tpu as dp
from dprox_tpu.utils import imaging, metrics


def _exact_ls_problem():
    """min ||x - rhs||^2 + ||x||^2 -> x = rhs / 2."""
    x = dp.Variable()
    rhs = np.random.RandomState(0).rand(1, 1, 8, 8).astype(np.float32)
    data = dp.sum_squares(x, b=dp.utils.array(rhs))
    reg = dp.sum_squares(x)
    return [data, reg], rhs


class TestExactLeastSquares:
    def test_two_quadratics_closed_form(self):
        fns, rhs = _exact_ls_problem()
        solver = dp.compile(fns, method="admm")
        out = solver.solve(x0=jnp.zeros((1, 1, 8, 8)), max_iter=24)
        assert np.allclose(np.asarray(out), rhs / 2, atol=1e-4)

    @pytest.mark.parametrize("rfft_min,map_min", [(1, 10**9), (1, 1)])
    def test_freq_xupdate_strategies_agree(self, rfft_min, map_min,
                                           monkeypatch):
        """The size-gated rfft / per-channel-map x-update variants
        (sum_squares._freq_xupdate, tuned at 1024^2/2048^2 on v5e —
        benchmarks/fft_cliff.py) must agree with the full-complex path
        bit-for-tolerance. Thresholds are monkeypatched so the large-
        plane strategies run at test-sized shapes."""
        import importlib

        # the module (package attr `sum_squares` is shadowed by the class)
        ss = importlib.import_module("dprox_tpu.proxfn.sum_squares")

        rng = np.random.RandomState(3)
        sp = jnp.asarray(rng.rand(2, 3, 16, 16).astype(np.float32))
        # library-shaped spectra: numerator conj(H)*F(b) (conjugate-
        # symmetric), divisor |H|^2 + rho (even-symmetric) — the
        # half-spectrum path is only exact under these symmetries,
        # which every real-PSF gram diagonal satisfies
        Hf = ss._fftn2(jnp.asarray(rng.rand(1, 3, 16, 16)
                                   .astype(np.float32)))
        fc = jnp.conj(Hf) * ss._fftn2(
            jnp.asarray(rng.rand(1, 3, 16, 16).astype(np.float32)))
        diag = jnp.abs(Hf[:, :1]) ** 2 + 0.5
        want = np.asarray(ss._freq_xupdate(sp, fc, diag, 1e-7))
        # scalar diag + no freq_const (plain-path shape)
        want2 = np.asarray(ss._freq_xupdate(sp, None, 2.0, 1e-7))

        monkeypatch.setattr(ss, "_RFFT_MIN_PLANE", rfft_min)
        monkeypatch.setattr(ss, "_MAP_MIN_PLANE", map_min)
        got = np.asarray(ss._freq_xupdate(sp, fc, diag, 1e-7))
        assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()
        got2 = np.asarray(ss._freq_xupdate(sp, None, 2.0, 1e-7))
        assert np.allclose(got2, want2, atol=1e-5)

    def test_freq_xupdate_bcast_diag_map_branch(self, monkeypatch):
        """ADVICE r4: a broadcast-shaped diag like (B,1,1,1) — every gram
        diagonal scalar, rho expanded to bchw — must survive the lax.map
        branch for batch>1 instead of breaking the final reshape."""
        import importlib

        ss = importlib.import_module("dprox_tpu.proxfn.sum_squares")
        rng = np.random.RandomState(5)
        sp = jnp.asarray(rng.rand(2, 3, 16, 16).astype(np.float32))
        diag = jnp.asarray(rng.rand(2, 1, 1, 1).astype(np.float32)) + 1.0
        want = np.asarray(ss._freq_xupdate(sp, None, diag, 1e-7))
        monkeypatch.setattr(ss, "_RFFT_MIN_PLANE", 1)
        monkeypatch.setattr(ss, "_MAP_MIN_PLANE", 1)
        got = np.asarray(ss._freq_xupdate(sp, None, diag, 1e-7))
        assert got.shape == want.shape == sp.shape
        assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()

    def test_freq_xupdate_complex_diag_falls_back(self, monkeypatch):
        """ADVICE r4: a complex diag (BlackBox freq_diag spectrum whose
        even symmetry cannot be established) must be served by the exact
        full-complex path even above the rfft gate."""
        import importlib

        ss = importlib.import_module("dprox_tpu.proxfn.sum_squares")
        rng = np.random.RandomState(7)
        sp = jnp.asarray(rng.rand(1, 1, 16, 16).astype(np.float32))
        # deliberately non-symmetric complex divisor
        diag = jnp.asarray((rng.rand(1, 1, 16, 16)
                            + 1j * rng.rand(1, 1, 16, 16)
                            ).astype(np.complex64)) + 2.0
        want = np.asarray(ss._freq_xupdate(sp, None, diag, 1e-7))
        monkeypatch.setattr(ss, "_RFFT_MIN_PLANE", 1)
        monkeypatch.setattr(ss, "_MAP_MIN_PLANE", 1)
        got = np.asarray(ss._freq_xupdate(sp, None, diag, 1e-7))
        assert np.allclose(got, want, atol=1e-6)

    def test_conv_least_squares_fft(self):
        # min ||conv(x) - b||^2 has exact solution via FFT division
        rng = np.random.RandomState(1)
        gt = rng.rand(1, 1, 16, 16).astype(np.float32)
        psf = imaging.fspecial_gaussian(5, 1.5)
        x = dp.Variable()
        K = dp.conv(x, psf)
        b = np.asarray(dp.linop.eval(K, jnp.asarray(gt)))
        data = dp.sum_squares(K, b=dp.utils.array(b))
        # tiny Tikhonov for invertibility
        reg = dp.sum_squares(dp.grad(x, 0)) * 1e-6
        solver = dp.compile([data, dp.nonneg(x)], method="admm")
        out = solver.solve(x0=jnp.asarray(b), max_iter=30, rhos=1e-5, lams=1e-5)
        resid = np.abs(np.asarray(dp.linop.eval(K, out)) - b).max()
        assert resid < 1e-3


def _deconv_problem(seed=0, prior="nonneg"):
    img = imaging.sample("face")  # [1,3,H,W]
    img = img[:, :, :128, :128]
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    data_term = dp.sum_squares(dp.conv(x, psf) - b)
    if prior == "tv":
        reg_term = dp.norm1(dp.grad(x, 0) + dp.grad(x, 1))
    else:
        # identity-linop prior — the configuration every algorithm in the
        # reference test suite uses (deep_prior(x) there)
        reg_term = dp.nonneg(x)
    return img, b, [data_term, reg_term], x


@pytest.mark.parametrize("method", ["admm", "ladmm", "admm_vxu", "hqs", "pc", "pgd"])
def test_algorithms_improve_psnr(method):
    img, b, fns, x = _deconv_problem()
    solver = dp.compile(fns, method=method)
    kw = dict(x0=b, max_iter=24, rhos=0.05, lams=0.01)
    if method == "pc":
        kw.update(rhos=1.0, lams=0.1)
    if method == "pgd":
        kw.update(rhos=0.4, lams=0.002)
    out = solver.solve(**kw)
    psnr_in = metrics.psnr(b, img)
    psnr_out = metrics.psnr(out, img)
    assert np.isfinite(psnr_out)
    assert psnr_out > psnr_in + 0.5, f"{method}: {psnr_in:.2f} -> {psnr_out:.2f}"


def test_admm_tv_prior():
    img, b, fns, x = _deconv_problem(prior="tv")
    solver = dp.compile(fns, method="admm")
    out = solver.solve(x0=b, max_iter=24, rhos=1.0, lams=0.005)
    assert metrics.psnr(out, img) > metrics.psnr(b, img) + 0.5


def test_freq_diagonal_dispatch():
    _, b, fns, x = _deconv_problem()
    solver = dp.compile(fns, method="admm")
    assert solver.least_square.freq_diagonalizable


def test_cg_fallback_matches_direct():
    # force CG; must agree with the FFT direct solve
    img, b, fns, x = _deconv_problem()
    s_direct = dp.compile(fns, method="admm")
    s_cg = dp.compile(fns, method="admm", try_diagonalize=False,
                      linear_solve_config=dp.LinearSolveConfig(rtol=1e-9, max_iters=200))
    assert not s_cg.least_square.freq_diagonalizable
    out_d = s_direct.solve(x0=b, max_iter=5, rhos=1.0, lams=0.005)
    out_c = s_cg.solve(x0=b, max_iter=5, rhos=1.0, lams=0.005)
    assert np.allclose(np.asarray(out_d), np.asarray(out_c), atol=1e-2)


def test_return_full_states_and_callback():
    img, b, fns, x = _deconv_problem()
    solver = dp.compile(fns, method="admm")
    traj = solver.solve(x0=b, max_iter=4, return_full_states=True)
    assert traj[0].shape[0] == 4  # stacked per-iteration x

    seen = []
    solver.solve(x0=b, max_iter=3,
                 callback=lambda **kw: seen.append(kw["iter"]))
    assert seen == [0, 1, 2]


def test_batched_solve():
    img, b, fns, x = _deconv_problem()
    b2 = jnp.concatenate([b, b * 0.9], axis=0)
    solver = dp.compile(fns, method="admm")
    out = solver.solve(x0=b2, max_iter=6)
    assert out.shape[0] == 2


def test_solve_differentiable():
    # gradient of solve output w.r.t. a placeholder observation
    img = imaging.sample("face")[:, :, :32, :32]
    psf = imaging.point_spread_function(5, 2)
    x = dp.Variable()
    y_ph = dp.Placeholder("y")
    data = dp.sum_squares(dp.conv(x, psf) - y_ph)
    reg = dp.norm1(dp.grad(x, 0))
    solver = dp.compile([data, reg], method="admm")
    b = imaging.blurring(img, psf)

    def loss(y):
        out = solver.solve(x0=y, max_iter=3, params={"y": y})
        return jnp.mean((out - img) ** 2)

    g = jax.grad(loss)(b)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_per_sample_schedules():
    """rhos/lams can vary per batch element: shape [B, max_iter]."""
    img, b, fns, x = _deconv_problem()
    b2 = jnp.concatenate([b, b], axis=0)
    solver = dp.compile(fns, method="admm")
    rhos = np.stack([np.full(6, 0.05), np.full(6, 0.5)], axis=0)  # [2, 6]
    out = solver.solve(x0=b2, max_iter=6, rhos=rhos, lams=0.01)
    assert out.shape[0] == 2
    # the two samples used different rho schedules -> different outputs
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-4)


def test_multiple_psi_fns_and_lam_dict():
    """Two psi blocks (TV + nonneg) with per-fn lam schedules via dict."""
    img, b, _, _ = _deconv_problem()
    x = dp.Variable()
    data = dp.sum_squares(dp.conv(x, imaging.point_spread_function(15, 5)) - b)
    tv = dp.norm1(dp.grad(x, 0) + dp.grad(x, 1))
    pos = dp.nonneg(x)
    solver = dp.compile([data, tv, pos], method="admm")
    assert len(solver.psi_fns) == 2
    out = solver.solve(x0=b, max_iter=12, rhos=0.5,
                       lams={tv: 0.005, pos: 0.01})
    assert metrics.psnr(out, img) > metrics.psnr(b, img)


class TestSolveWithResiduals:
    def _tv_deconv(self, H=64):
        img = imaging.sample("face")[:, :, :H, :H]
        psf = imaging.point_spread_function(15, 5)
        b = imaging.blurring(img, psf)
        x = dp.Variable()
        fns = [dp.sum_squares(dp.conv(x, psf) - b),
               dp.norm1(dp.grad(x, 0) + dp.grad(x, 1))]
        return img, b, fns

    def test_residuals_converge_and_match_solve(self):
        img, b, fns = self._tv_deconv()
        solver = dp.compile(fns, method="admm")
        out, res = solver.solve_with_residuals(x0=b, max_iter=200,
                                               rhos=0.05, lams=0.001)
        rp = np.asarray(res["r_primal"])
        rd = np.asarray(res["r_dual"])
        assert rp.shape == (200,) and rd.shape == (200,)
        assert np.isfinite(rp).all() and np.isfinite(rd).all()
        # converging run: the tail residuals are far below the head
        assert rp[-1] < 1e-3 and rp[-1] < rp[1] / 50
        assert rd[-1] < rd[1] / 50
        # same iterates as the plain solve
        ref = solver.solve(x0=b, max_iter=200, rhos=0.05, lams=0.001)
        assert np.allclose(np.asarray(out), np.asarray(jnp.real(ref)),
                           atol=1e-5)

    def test_residuals_match_offline_recomputation(self):
        """Cross-check the in-scan residuals against a recomputation from
        callback-captured states (the non-jit execution path)."""
        img, b, fns = self._tv_deconv(H=32)
        solver = dp.compile(fns, method="admm")
        states = []
        solver.solve(x0=b, max_iter=5, rhos=0.05, lams=0.001,
                     callback=lambda **kw: states.append(kw["state"]))
        _, res = solver.solve_with_residuals(x0=b, max_iter=5,
                                             rhos=0.05, lams=0.001)
        prev = solver.initialize(solver._prepare_x0(b), {})
        for k, st in enumerate(states):
            r = solver.residuals(prev, st, 0.05, {})
            assert np.allclose(float(r["r_primal"]),
                               np.asarray(res["r_primal"])[k], rtol=1e-3,
                               atol=1e-6)
            assert np.allclose(float(r["r_dual"]),
                               np.asarray(res["r_dual"])[k], rtol=1e-3,
                               atol=1e-6)
            prev = st

    def test_solve_until_early_stop(self):
        """Device-side early stopping: stops before max_iter, satisfies
        the tolerance, and matches the plain solve truncated at the same
        iteration count."""
        img = imaging.sample("face")[:, :, :64, :64]
        psf = imaging.point_spread_function(15, 5)
        b = imaging.blurring(img, psf)
        x = dp.Variable()
        solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                             dp.nonneg(x)], "admm")
        out, k = solver.solve_until(x0=b, max_iter=300, tol=1e-4,
                                    rhos=0.05, lams=0.01)
        k = int(k)
        assert 0 < k < 300
        _, res = solver.solve_with_residuals(x0=b, max_iter=k, rhos=0.05,
                                             lams=0.01)
        assert np.asarray(res["r_primal"])[-1] < 1e-4
        assert np.asarray(res["r_dual"])[-1] < 1e-4
        ref = solver.solve(x0=b, max_iter=k, rhos=0.05, lams=0.01)
        assert np.allclose(np.asarray(out), np.asarray(jnp.real(ref)),
                           atol=1e-5)

    def test_non_consensus_algorithms_raise(self):
        img, b, fns = self._tv_deconv(H=32)
        for method in ("hqs", "pc", "pgd"):
            try:
                solver = dp.compile(fns, method=method)
            except Exception:
                continue  # pgd partition may reject this objective
            with pytest.raises(NotImplementedError):
                solver.solve_with_residuals(x0=b, max_iter=2)


class TestConsensusADMM:
    """Consensus-form ADMM (cadmm): block-separable per-fn updates."""

    def test_two_quadratics_exact(self):
        # min ||x-b1||^2 + ||x-b2||^2 -> x = (b1+b2)/2; consensus ADMM
        # on quadratic blocks converges to the aggregate optimum
        rng = np.random.RandomState(0)
        b1 = jnp.asarray(rng.rand(1, 1, 8, 8), jnp.float32)
        b2 = jnp.asarray(rng.rand(1, 1, 8, 8), jnp.float32)
        x = dp.Variable()
        s = dp.compile([dp.sum_squares(x - b1), dp.sum_squares(x - b2)],
                       method="cadmm")
        out = s.solve(x0=jnp.zeros_like(b1), max_iter=100, rhos=1.0,
                      lams=0.1)
        assert float(jnp.abs(out - (b1 + b2) / 2).max()) < 1e-5

    def test_deconv_improves_psnr(self):
        img, b, fns, x = _deconv_problem()
        solver = dp.compile(fns, method="cadmm")
        out = solver.solve(x0=b, max_iter=24, rhos=0.05, lams=0.01)
        assert metrics.psnr(out, img) > metrics.psnr(b, img) + 0.5

    def test_prior_ensemble_consensus_equilibrium(self):
        # data term + TWO prior blocks (tv + nonneg): solver-level fusion
        img, b, _, x = _deconv_problem()
        psf = imaging.point_spread_function(15, 5)
        fns = [dp.sum_squares(dp.conv(x, psf) - b),
               dp.deep_prior(x, "tv"), dp.nonneg(x)]
        solver = dp.compile(fns, method="cadmm")
        out = solver.solve(x0=b, max_iter=24, rhos=0.05,
                           lams={fns[1]: 0.02, fns[2]: 0.01})
        assert metrics.psnr(out, img) > metrics.psnr(b, img) + 0.5

    def test_residual_tracking(self):
        img, b, fns, x = _deconv_problem()
        solver = dp.compile(fns, method="cadmm")
        out, res = solver.solve_with_residuals(x0=b, max_iter=30,
                                               rhos=0.05, lams=0.01)
        rp = np.asarray(res["r_primal"])
        assert np.all(np.isfinite(rp)) and rp[-1] < rp[0]

    def test_rejects_nonquadratic_composite_linop(self):
        img, b, _, x = _deconv_problem()
        fns = [dp.sum_squares(x - b), dp.norm1(dp.grad(x, 0))]
        with pytest.raises(ValueError):
            dp.compile(fns, method="cadmm")


class TestMLProblemShapes:
    """Exact tiny least-squares recovery on non-image shapes — mirrors
    the reference's tests/problem/test_ml_problems.py:5-44 (2-D matrix,
    flat vector, HWC single-channel with a box-blur conv): the solver
    stack must not assume [B,C,H,W] inputs."""

    def test_lsq_matrix_2d(self):
        rhs = np.array([[1., 2, 3], [4, 5, 6], [7, 8, 9]], np.float32)
        x = dp.Variable()
        out = dp.Problem(dp.sum_squares(2 * x - rhs)).solve(
            method="admm", x0=jnp.zeros((3, 3)), max_iter=50,
            rhos=1.0, lams=0.1)
        np.testing.assert_allclose(np.asarray(out), rhs / 2, atol=1e-5)

    def test_lsq_vector_1d(self):
        rhs = np.array([1., 2, 3], np.float32)
        x = dp.Variable()
        out = dp.Problem(dp.sum_squares(2 * x - rhs)).solve(
            method="admm", x0=jnp.zeros(3), max_iter=50,
            rhos=1.0, lams=0.1)
        np.testing.assert_allclose(np.asarray(out), rhs / 2, atol=1e-5)

    def test_lsq_conv_small(self):
        # reference test_lsq2: conv data term driven to zero residual
        rng = np.random.RandomState(0)
        rhs = jnp.asarray(rng.rand(1, 1, 8, 8), jnp.float32)
        kernel = np.ones((3, 3), np.float32) / 9.0
        x = dp.Variable()
        K = dp.conv(x, kernel)
        out = dp.Problem(dp.sum_squares(K - rhs)).solve(
            method="admm", x0=jnp.zeros((1, 1, 8, 8)), max_iter=60,
            rhos=0.5, lams=0.1)
        resid = dp.linop.eval(K, out) - rhs
        assert float(jnp.max(jnp.abs(resid))) < 1e-3
