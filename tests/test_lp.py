"""LP solver: small LPs with known optima + the synthetic CEP model."""
import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linprog

import jax


@pytest.fixture(autouse=True, scope="module")
def enable_x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_small_lp_matches_scipy():
    # min c^T x s.t. A_ub x <= b_ub, A_eq x == b_eq, x >= 0
    rng = np.random.RandomState(0)
    n = 20
    c = rng.rand(n) + 0.1
    A_ub = sp.csr_matrix(rng.rand(10, n))
    b_ub = A_ub @ (rng.rand(n)) + 0.5
    A_eq = sp.csr_matrix(rng.rand(3, n))
    x_feas = rng.rand(n)
    b_eq = A_eq @ x_feas

    ref = linprog(c, A_ub.toarray(), b_ub, A_eq.toarray(), b_eq,
                  bounds=[(0, None)] * n, method="highs")
    assert ref.success

    from dprox_tpu.algo.lp import solve_lp

    x, history, results = solve_lp(c, A_ub, b_ub, A_eq, b_eq,
                                   max_iters=5000, pretrain_steps=5,
                                   verbose=False)
    obj = float(np.dot(c, np.asarray(x)))
    assert abs(obj - ref.fun) / max(abs(ref.fun), 1) < 5e-2
    # feasibility
    assert float((A_ub @ np.asarray(x) - b_ub).max()) < 1e-2
    assert float(np.abs(A_eq @ np.asarray(x) - b_eq).max()) < 1e-2
    assert float(np.asarray(x).min()) > -1e-2


def test_synthetic_cep_model():
    from dprox_tpu.contrib.energy_system import synthetic_cep_model
    from dprox_tpu.algo.lp import solve_lp

    c, A_ub, A_eq, b_ub, b_eq = synthetic_cep_model(n_periods=16, n_tech=4)
    ref = linprog(c, A_ub.toarray(), b_ub, A_eq.toarray(), b_eq,
                  bounds=[(0, None)] * c.shape[0], method="highs")
    assert ref.success
    x, history, results = solve_lp(c, A_ub, b_ub, A_eq, b_eq,
                                   max_iters=8000, pretrain_steps=5,
                                   verbose=False)
    obj = float(np.dot(c, np.asarray(x)))
    assert abs(obj - ref.fun) / abs(ref.fun) < 5e-2


def test_problem_dispatches_lp():
    import dprox_tpu as dp

    rng = np.random.RandomState(1)
    n = 10
    c = rng.rand(n) + 0.1
    A = rng.rand(4, n)
    x_feas = rng.rand(n)
    b = A @ x_feas

    x = dp.Variable()
    prob = dp.Problem(c @ x, [A @ x == b])
    sol, history, results = prob.solve(max_iters=3000, pretrain_steps=3,
                                       verbose=False)
    assert np.abs(A @ np.asarray(sol) - b).max() < 5e-2


def test_bsr_matvec_matches_scipy():
    from dprox_tpu.algo.lp import BSRMat

    rng = np.random.RandomState(3)
    for (m, n) in [(70, 33), (256, 300), (13, 513)]:
        A = sp.random(m, n, density=0.05, random_state=rng, format="csr")
        op = BSRMat(A, dtype=jax.numpy.float64)
        x = rng.rand(n)
        y = rng.rand(m)
        np.testing.assert_allclose(np.asarray(op @ x), A @ x, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(op.T @ y), A.T @ y, rtol=1e-12)
        assert op.shape == (m, n) and op.T.shape == (n, m)


def test_bsr_budget_fallback_to_bcoo():
    from jax.experimental import sparse as jsparse

    from dprox_tpu.algo.lp import scipy_to_device_op

    rng = np.random.RandomState(0)
    A = sp.random(400, 400, density=0.01, random_state=rng, format="csr")
    op, opT = scipy_to_device_op(A, dtype=jax.numpy.float64,
                                 tile_budget_bytes=16)
    assert isinstance(op, jsparse.BCOO)
    x = rng.rand(400)
    np.testing.assert_allclose(np.asarray(op @ x), A @ x, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(opT @ x), A.T @ x, rtol=1e-10)


def test_bsr_matvec_differentiable():
    from dprox_tpu.algo.lp import BSRMat

    rng = np.random.RandomState(1)
    A = sp.random(40, 30, density=0.2, random_state=rng, format="csr")
    op = BSRMat(A, dtype=jax.numpy.float64)

    def f(x):
        return jax.numpy.sum((op @ x) ** 2)

    x = jax.numpy.asarray(rng.rand(30))
    g = jax.grad(f)(x)
    g_ref = 2 * A.T @ (A @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-10)


def test_bsr_matmat_matches_scipy():
    from dprox_tpu.algo.lp import BSRMat

    rng = np.random.RandomState(5)
    A = sp.random(180, 230, density=0.05, random_state=rng, format="csr")
    op = BSRMat(A, dtype=jax.numpy.float64)
    X = rng.rand(230, 6)
    Y = rng.rand(180, 6)
    np.testing.assert_allclose(np.asarray(op.matmat(X)), A @ X, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(op.rmatmat(Y)), A.T @ Y, rtol=1e-12)


class TestConsensusLP:
    """Scenario-parallel consensus ADMM (progressive hedging) vs the
    extensive-form ground truth, single-device and over the mesh."""

    def _instance(self, S=4):
        from dprox_tpu.contrib.energy_system import synthetic_cep_scenarios

        return synthetic_cep_scenarios(16, 4, S)

    def test_matches_extensive_form(self):
        from scipy.optimize import linprog

        from dprox_tpu.algo.lp import solve_consensus_lp
        from dprox_tpu.contrib.energy_system import extensive_form

        c, A_ub, A_eq, b_ub, b_eq_s, sh = self._instance()
        cf, Auf, Aef, buf, bef = extensive_form(c, A_ub, A_eq, b_ub, b_eq_s, sh)
        ref = linprog(cf, Auf, buf, Aef, bef, bounds=(0, None), method="highs")
        z, xs, hist, res = solve_consensus_lp(
            c, A_ub, b_ub, A_eq, b_eq_s, sh, max_outer=300, eval_freq=100,
            tol=1e-3, rho_ph=1.0, verbose=False)
        assert abs(res["objective"] - ref.fun) / abs(ref.fun) < 2e-3
        # consensus capacity close to the extensive-form first stage
        assert np.abs(z - ref.x[:4]).max() < 1.0
        assert res["r_nonanticipativity"] < 5e-2

    def test_mesh_path_matches_single_device(self):
        from dprox_tpu.algo.lp import solve_consensus_lp
        from dprox_tpu.parallel import create_mesh

        c, A_ub, A_eq, b_ub, b_eq_s, sh = self._instance(S=8)
        # adaptation off: its host-side x2 branches compare residuals that
        # differ at float-noise level between the two paths
        kw = dict(max_outer=60, eval_freq=30, tol=0, rho_ph=1.0,
                  adapt_rho_ph=False)
        z1, xs1, _, r1 = solve_consensus_lp(c, A_ub, b_ub, A_eq, b_eq_s, sh, **kw)
        mesh = create_mesh(("scenario",), (8,))
        z2, xs2, _, r2 = solve_consensus_lp(c, A_ub, b_ub, A_eq, b_eq_s, sh,
                                            mesh=mesh, **kw)
        np.testing.assert_allclose(z1, z2, atol=1e-6)
        np.testing.assert_allclose(xs1, xs2, atol=1e-5)

    def test_f32_runs(self):
        # the dtype the real-TPU path uses
        from dprox_tpu.algo.lp import solve_consensus_lp

        c, A_ub, A_eq, b_ub, b_eq_s, sh = self._instance()
        z, xs, hist, res = solve_consensus_lp(
            c, A_ub, b_ub, A_eq, b_eq_s, sh, dtype=jax.numpy.float32,
            max_outer=60, eval_freq=30, tol=0, rho_ph=1.0,
            pcg_rtol=1e-6)
        assert np.isfinite(res["objective"])
        assert res["r_nonanticipativity"] < 10.0

    def test_probs_weighting_matches_duplication(self):
        """probs=[2,1,1]/4 on 3 scenarios == uniform over 4 scenarios
        with the first duplicated (probability-weighted progressive
        hedging is exactly scenario replication)."""
        from dprox_tpu.algo.lp import ConsensusLPSolver, ScenarioLP

        c, A_ub, A_eq, b_ub, b_eq_s, sh = self._instance(S=4)
        b3 = b_eq_s[1:]  # 3 distinct scenarios
        b4 = np.concatenate([b3[:1], b3], axis=0)  # first duplicated
        kw = dict(max_outer=60, eval_freq=30, tol=0, adapt_rho_ph=False)
        s = ConsensusLPSolver()
        pw = ScenarioLP(c, A_ub, b_ub, A_eq, b3, sh,
                        probs=np.array([2.0, 1.0, 1.0]))
        pd = ScenarioLP(c, A_ub, b_ub, A_eq, b4, sh)
        zw, _, _, rw = s.solve(pw, **kw)
        zd, _, _, rd = s.solve(pd, **kw)
        np.testing.assert_allclose(zw, zd, atol=1e-8)
        np.testing.assert_allclose(rw["objective"], rd["objective"],
                                   rtol=1e-9)

    def test_fused_clamps_non_divisible_eval_freq(self):
        """eval_freq=25, max_outer=57: the fused loop must stop at
        exactly 57 outer iterations (last chunk clamped), matching the
        host-chunked solve."""
        from dprox_tpu.algo.lp import ConsensusLPSolver, ScenarioLP

        c, A_ub, A_eq, b_ub, b_eq_s, sh = self._instance(S=4)
        p = ScenarioLP(c, A_ub, b_ub, A_eq, b_eq_s, sh)
        s = ConsensusLPSolver()
        kw = dict(max_outer=57, eval_freq=25, tol=0, adapt_rho_ph=False)
        z1, _, _, r1 = s.solve(p, **kw)
        z2, _, r2 = s.solve_fused(p, **kw)
        assert r2["outer_iters"] == 57 == r1["outer_iters"]
        np.testing.assert_allclose(z1, z2, atol=1e-10)

    def test_fused_cache_respects_pcg_rtol(self):
        """Two solve_fused calls on the same problem differing only in
        pcg_rtol must not share a compiled executable (ADVICE round 1:
        the rtol is baked into the chunk closure)."""
        from dprox_tpu.algo.lp import ConsensusLPSolver, ScenarioLP

        c, A_ub, A_eq, b_ub, b_eq_s, sh = self._instance(S=4)
        p = ScenarioLP(c, A_ub, b_ub, A_eq, b_eq_s, sh)
        s = ConsensusLPSolver()
        kw = dict(max_outer=20, eval_freq=20, tol=0, adapt_rho_ph=False)
        s.solve_fused(p, pcg_rtol=1e-9, **kw)
        n1 = len(s._fused_cache)
        # a crude rtol (1e-1) must trace a NEW program, not reuse 1e-9's
        s.solve_fused(p, pcg_rtol=1e-1, **kw)
        assert len(s._fused_cache) == n1 + 1

    def test_pretrain_reduces_convergence_loss(self):
        import jax.numpy as jnp

        from dprox_tpu.algo.lp import ConsensusLPSolver, ScenarioLP

        c, A_ub, A_eq, b_ub, b_eq_s, sh = self._instance()
        p = ScenarioLP(c, A_ub, b_ub, A_eq, b_eq_s, sh)
        solver = ConsensusLPSolver()

        def loss(params):
            r_na, r_p, _ = solver.solve_truncated(p, params)
            return float(jnp.log(r_na) + jnp.log(r_p))

        l0 = loss(solver.init_params())
        params = solver.pretrain(p, steps=10)
        l1 = loss(params)
        # best-iterate tracking guarantees never-worse than the defaults
        assert np.isfinite(l1) and l1 <= l0 + 1e-9
        # learned params stay in their valid domains
        assert float(params["rho"]) > 0 and float(params["sigma"]) > 0
        assert 0 < float(params["alpha"]) < 2
        # and the full solve runs with them
        z, xs, hist, res = solver.solve(p, params=params, max_outer=40,
                                        eval_freq=40, tol=0)
        assert np.isfinite(res["objective"])


def test_fused_solve_matches_chunked():
    """solve_fused (single device program, on-device convergence +
    residual balancing) agrees with the host-chunked solve."""
    from dprox_tpu.algo.lp import LPProblem, LPSolverADMM

    rng = np.random.RandomState(2)
    n = 20
    c = rng.rand(n) + 0.1
    A_ub = sp.csr_matrix(rng.rand(10, n))
    b_ub = A_ub @ rng.rand(n) + 0.5
    A_eq = sp.csr_matrix(rng.rand(3, n))
    b_eq = A_eq @ rng.rand(n)
    p = LPProblem(c, A_ub, b_ub, A_eq, b_eq)
    s = LPSolverADMM(verbose=False)
    x1, hist, res1 = s.solve(p, max_iters=5000, residual_balance=True)
    x2, res2 = s.solve_fused(p, max_iters=5000)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-4)
    assert res2["r_norm"] < res2["eps_primal"]
    assert res2["s_norm"] < res2["eps_dual"]
    assert 0 < res2["iters"] <= 5000


def test_consensus_fused_matches_chunked():
    from dprox_tpu.algo.lp import ConsensusLPSolver, ScenarioLP
    from dprox_tpu.contrib.energy_system import synthetic_cep_scenarios
    from dprox_tpu.parallel import create_mesh

    c, A_ub, A_eq, b_ub, b_eq_s, sh = synthetic_cep_scenarios(16, 4, 8)
    p = ScenarioLP(c, A_ub, b_ub, A_eq, b_eq_s, sh)
    s = ConsensusLPSolver()
    kw = dict(max_outer=80, eval_freq=40, tol=1e-3)
    z1, x1, _, r1 = s.solve(p, **kw)
    z2, x2, r2 = s.solve_fused(p, **kw)
    np.testing.assert_allclose(z1, z2, atol=1e-9)
    assert r1["rho_ph_final"] == r2["rho_ph_final"]
    # mesh variant: the while_loop (incl. consensus pmean) runs inside
    # one shard_map program
    mesh = create_mesh(("scenario",), (8,))
    p2 = ScenarioLP(c, A_ub, b_ub, A_eq, b_eq_s, sh)
    z3, x3, r3 = s.solve_fused(p2, mesh=mesh, **kw)
    np.testing.assert_allclose(z2, z3, atol=1e-5)


def test_fused_solve_f32():
    """f32 is the real-TPU dtype: the fused loop must converge with the
    dtype-floored inner rtol schedule."""
    from dprox_tpu.algo.lp import LPProblem, LPSolverADMM

    rng = np.random.RandomState(4)
    n = 20
    c = rng.rand(n) + 0.1
    A_ub = sp.csr_matrix(rng.rand(10, n))
    b_ub = A_ub @ rng.rand(n) + 0.5
    A_eq = sp.csr_matrix(rng.rand(3, n))
    b_eq = A_eq @ rng.rand(n)
    ref = linprog(c, A_ub.toarray(), b_ub, A_eq.toarray(), b_eq,
                  bounds=[(0, None)] * n, method="highs")
    p = LPProblem(c, A_ub, b_ub, A_eq, b_eq, dtype=jax.numpy.float32)
    s = LPSolverADMM(dtype=jax.numpy.float32, verbose=False)
    x, res = s.solve_fused(p, max_iters=8000)
    obj = float(np.dot(c, np.asarray(x)))
    assert abs(obj - ref.fun) / max(abs(ref.fun), 1) < 5e-2
    assert float(np.abs(A_eq @ np.asarray(x) - b_eq).max()) < 5e-2


def test_consensus_mesh_solve_does_not_mutate_problem():
    """Regression: the mesh solve used to device_put p.lb/p.ub with the
    mesh sharding in place, committing the caller's problem object."""
    from dprox_tpu.algo.lp import ConsensusLPSolver, ScenarioLP
    from dprox_tpu.contrib.energy_system import synthetic_cep_scenarios
    from dprox_tpu.parallel import create_mesh

    c, A_ub, A_eq, b_ub, b_eq_s, sh = synthetic_cep_scenarios(16, 4, 8)
    p = ScenarioLP(c, A_ub, b_ub, A_eq, b_eq_s, sh)
    lb_before = np.asarray(p.lb).copy()
    mesh = create_mesh(("scenario",), (8,))
    s = ConsensusLPSolver()
    s.solve(p, mesh=mesh, max_outer=4, eval_freq=4, tol=0)
    # same values, and still usable by a single-device solve afterwards
    np.testing.assert_array_equal(np.asarray(p.lb), lb_before)
    z, xs, _, res = s.solve(p, max_outer=4, eval_freq=4, tol=0)
    assert np.isfinite(res["objective"])


def test_fused_solve_respects_max_iters():
    from dprox_tpu.algo.lp import LPProblem, LPSolverADMM

    rng = np.random.RandomState(7)
    n = 15
    c = rng.rand(n) + 0.1
    A_eq = sp.csr_matrix(rng.rand(3, n))
    b_eq = A_eq @ rng.rand(n)
    p = LPProblem(c, None, None, A_eq, b_eq)
    s = LPSolverADMM(verbose=False, abstol=1e-12, reltol=1e-12)
    # unreachable tolerance: the loop must stop at exactly max_iters
    # even when eval_freq does not divide it
    x, res = s.solve_fused(p, max_iters=57, eval_freq=25)
    assert res["iters"] == 57


def test_fused_solve_size_gate_falls_back_to_chunked(monkeypatch):
    """VERDICT r4 #4: past the probed fused-program envelope (~33k vars
    on the axon backend) solve_fused must DEGRADE to the chunked solve
    with a warning, not fault the backend. Gate exercised here by
    shrinking the bound via DPROX_LP_FUSED_MAX_VARS."""
    import warnings

    from dprox_tpu.algo.lp import LPProblem, LPSolverADMM

    rng = np.random.RandomState(11)
    n = 20
    c = rng.rand(n) + 0.1
    A_ub = sp.csr_matrix(rng.rand(10, n))
    b_ub = A_ub @ rng.rand(n) + 0.5
    A_eq = sp.csr_matrix(rng.rand(3, n))
    b_eq = A_eq @ rng.rand(n)
    p = LPProblem(c, A_ub, b_ub, A_eq, b_eq)
    s = LPSolverADMM(verbose=False)

    monkeypatch.setenv("DPROX_LP_FUSED_MAX_VARS", str(n - 1))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        x, res = s.solve_fused(p, max_iters=5000)
    assert any("envelope" in str(wi.message) for wi in w)
    assert res["fallback"] == "chunked"
    # converged result with the same results-dict contract as the fused path
    assert res["r_norm"] < res["eps_primal"]
    assert res["s_norm"] < res["eps_dual"]
    assert 0 < res["iters"] <= 5000
    x_ref, _, _ = s.solve(p, max_iters=5000, residual_balance=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-6)

    # above the gate the genuinely fused path still runs
    monkeypatch.setenv("DPROX_LP_FUSED_MAX_VARS", "33000")
    x2, res2 = s.solve_fused(p, max_iters=5000)
    assert "fallback" not in res2
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-4)
