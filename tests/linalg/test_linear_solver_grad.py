"""Three-way implicit-gradient cross-check.

Mirrors the reference's strongest test design
(/root/reference/tests/linalg/test_linear_solver_grad.py:101-123): compute
dL/db and dL/dtheta for L = sum(solve(A(theta), b)) three ways —

1. full autodiff through a dense jnp.linalg.solve,
2. the matrix implicit formula (gb = A^-T g; gtheta = -gb^T dA/dtheta x),
3. the matrix-free implicit path used by dprox_tpu.linalg.linear_solve —

and assert they agree over multiple seeds.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dprox_tpu.linalg import LinearSolveConfig, linear_solve


def setup(seed, n=6):
    rng = np.random.RandomState(seed)
    P = rng.rand(n, n).astype(np.float32)
    theta = jnp.asarray(P)
    b = jnp.asarray(rng.rand(1, n).astype(np.float32))
    return theta, b, n


def A_dense(theta, n):
    return theta @ theta.T + n * jnp.eye(n)


def A_fn(theta, v):
    # matrix-free SPD matvec parameterized by theta
    n = v.shape[-1]
    A = A_dense(theta, n)
    return jnp.einsum("ij,bj->bi", A, v)


@pytest.mark.parametrize("seed", range(8))
def test_three_way_gradients(seed):
    theta, b, n = setup(seed)

    # 1. autodiff through dense solve
    def loss_dense(theta, b):
        A = A_dense(theta, n)
        x = jnp.linalg.solve(A, b[0])
        return jnp.sum(x)

    g_dense = jax.grad(loss_dense, argnums=(0, 1))(theta, b)

    # 2. matrix implicit formula
    A = A_dense(theta, n)
    x = jnp.linalg.solve(A, b[0])
    g = jnp.ones_like(x)
    gb_mat = jnp.linalg.solve(A.T, g)

    def Ax(theta):
        return jnp.einsum("ij,j->i", A_dense(theta, n), x)

    _, vjp = jax.vjp(Ax, theta)
    (gtheta_mat,) = vjp(gb_mat)
    gtheta_mat = -gtheta_mat

    # 3. matrix-free implicit path (ours)
    def loss_ours(theta, b):
        x = linear_solve(A_fn, b, theta=theta,
                         config=LinearSolveConfig(rtol=1e-8, max_iters=500))
        return jnp.sum(x)

    g_ours = jax.grad(loss_ours, argnums=(0, 1))(theta, b)

    assert np.allclose(np.asarray(g_dense[1][0]), np.asarray(gb_mat), atol=1e-3)
    assert np.allclose(np.asarray(g_ours[1][0]), np.asarray(gb_mat), atol=1e-3)
    assert np.allclose(np.asarray(g_dense[0]), np.asarray(gtheta_mat), atol=1e-3)
    assert np.allclose(np.asarray(g_ours[0]), np.asarray(gtheta_mat), atol=1e-3)


def test_unrolled_matches_analytic():
    theta, b, n = setup(99)

    def loss(cfg):
        def inner(theta, b):
            x = linear_solve(A_fn, b, theta=theta, config=cfg)
            return jnp.sum(x)

        return jax.grad(inner, argnums=(0, 1))(theta, b)

    g_analytic = loss(LinearSolveConfig(rtol=1e-9, max_iters=500, use_analytic_grad=True))
    g_unrolled = loss(LinearSolveConfig(rtol=1e-9, max_iters=500, use_analytic_grad=False))
    for ga, gu in zip(g_analytic, g_unrolled):
        assert np.allclose(np.asarray(ga), np.asarray(gu), atol=1e-3)
