"""Solver accuracy on small SPD systems (mirrors
/root/reference/tests/linalg/test_linear_solver.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dprox_tpu.linalg import cg, cg2, pcg, plss, minres


def make_spd(n=5, seed=0, batch=1):
    rng = np.random.RandomState(seed)
    P = rng.rand(n, n)
    A = P @ P.T + n * np.eye(n)
    x = rng.rand(n)
    b = A @ x
    Ab = np.broadcast_to(A, (batch, n, n))
    return (jnp.asarray(Ab, jnp.float32), jnp.asarray(np.broadcast_to(b, (batch, n)), jnp.float32),
            np.broadcast_to(x, (batch, n)))


def matvec(A):
    return lambda v: jnp.einsum("bij,bj->bi", A, v)


@pytest.mark.parametrize("solver", [cg, cg2, pcg, plss, minres])
def test_solvers_match_solution(solver):
    A, b, x = make_spd()
    xh = solver(matvec(A), b, rtol=1e-7, max_iters=500)
    assert np.allclose(np.asarray(xh), x, atol=1e-3), f"{solver.__name__}: {np.abs(np.asarray(xh)-x).max()}"


@pytest.mark.parametrize("solver", [cg, pcg])
def test_batched_varied_rhs(solver):
    # different RHS per batch element: per-batch convergence must hold
    A, _, _ = make_spd(n=8, batch=1)
    A = jnp.tile(A, (3, 1, 1))
    rng = np.random.RandomState(1)
    xs = rng.rand(3, 8).astype(np.float32) * np.array([[1.0], [10.0], [100.0]], np.float32)
    b = jnp.einsum("bij,bj->bi", A, jnp.asarray(xs))
    xh = solver(matvec(A), b, rtol=1e-7, max_iters=500)
    assert np.allclose(np.asarray(xh), xs, rtol=1e-3, atol=1e-3)


def test_pcg_jacobi_preconditioner():
    A, b, x = make_spd(n=12, seed=3)
    diag = jnp.diagonal(A, axis1=1, axis2=2)
    Minv = lambda r: r / diag
    xh = pcg(matvec(A), b, Minv=Minv, rtol=1e-8, max_iters=300)
    assert np.allclose(np.asarray(xh), x, atol=1e-3)
