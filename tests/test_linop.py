"""Linop adjoint correctness via dot-product tests + offset extraction.

Mirrors the test strategy of /root/reference/tests/test_linop.py: for each
operator, validate <K m, d> == <m, K^T d> and check constant-offset
extraction and diagonality flags.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dprox_tpu as dp
from dprox_tpu.linop import Variable, Placeholder, validate, eval as lin_eval, adjoint as lin_adjoint


KEY = jax.random.key(42)


def rand(shape, key=KEY):
    return jax.random.normal(key, shape, jnp.float32)


class TestAdjoint:
    def test_conv(self):
        x = Variable()
        psf = np.random.RandomState(0).rand(5, 5).astype(np.float32)
        op = dp.conv(x, psf)
        assert validate(op, shape=(1, 3, 16, 16))

    def test_grad(self):
        x = Variable()
        for dim in (0, 1, 2):
            assert validate(dp.grad(x, dim), shape=(1, 3, 16, 16))

    def test_mosaic(self):
        x = Variable()
        assert validate(dp.mosaic(x), shape=(1, 3, 16, 16))

    def test_scale_sum(self):
        x = Variable()
        op = 2.0 * dp.conv(x, np.ones((3, 3), np.float32) / 9) + dp.grad(x, 0)
        assert validate(op, shape=(1, 3, 16, 16))

    def test_mul_elementwise(self):
        x = Variable()
        w = np.random.RandomState(1).rand(1, 3, 16, 16).astype(np.float32)
        assert validate(dp.mul_elementwise(x, w), shape=(1, 3, 16, 16))

    def test_mul_color(self):
        x = Variable()
        srf = np.random.RandomState(2).rand(8, 3).astype(np.float32)
        op = dp.mul_color(x, srf)
        m = rand((1, 8, 4, 4))
        Km = lin_eval(op, m)
        assert Km.shape == (1, 3, 4, 4)
        d = rand(Km.shape, jax.random.key(7))
        Ktd = lin_adjoint(op, d)
        assert np.allclose(float(jnp.sum(Km * d)), float(jnp.sum(m * Ktd)), rtol=1e-4)

    def test_conv_doe(self):
        x = Variable()
        ph = Placeholder("psf")
        op = dp.conv_doe(x, ph, circular=True)
        psf = np.random.RandomState(3).rand(1, 3, 5, 5).astype(np.float32)
        params = {"psf": psf}
        m = rand((1, 3, 16, 16))
        Km = lin_eval(op, m, params)
        d = rand(Km.shape, jax.random.key(8))
        Ktd = lin_adjoint(op, d, params)
        assert np.allclose(float(jnp.sum(Km * d)), float(jnp.sum(m * Ktd)), rtol=1e-4)

    def test_blackbox(self):
        x = Variable()

        def fwd(v, params=None, step=None):
            return jnp.roll(v, 1, axis=-1)

        def adj(v, params=None, step=None):
            return jnp.roll(v, -1, axis=-1)

        op = dp.BlackBox(x, fwd, adj)
        assert validate(op, shape=(1, 3, 8, 8))

    def test_shared_subexpression(self):
        # x used twice: adjoint contributions must accumulate
        x = Variable()
        op = dp.grad(x, 0) + dp.grad(x, 1)
        assert validate(op, shape=(1, 3, 16, 16))


class TestOffset:
    def test_offset_extraction(self):
        x = Variable()
        b = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
        expr = dp.conv(x, np.ones((3, 3), np.float32)) - b
        off = expr.offset({x.name: (1, 3, 8, 8)})
        # offset of (Kx - b) is -b (BCHW)
        assert np.allclose(np.asarray(off), -b.transpose(2, 0, 1)[None], atol=1e-6)

    def test_linear_part_excludes_constant(self):
        x = Variable()
        b = np.ones((8, 8, 3), np.float32)
        expr = dp.grad(x, 0) - b
        m = rand((1, 3, 8, 8))
        linear = lin_eval(expr, m)  # zero_constants=True default
        full = expr.forward({x.name: m})
        assert np.allclose(np.asarray(full - linear), -1.0, atol=1e-5)


class TestDiagonality:
    def test_conv_freq_diag(self):
        x = Variable()
        op = dp.conv(x, np.ones((3, 3), np.float32) / 9)
        assert op.is_diag(freq=True)
        assert not op.is_diag(freq=False)
        assert op.is_gram_diag(freq=True)

    def test_mosaic_spatial_diag(self):
        x = Variable()
        op = dp.mosaic(x)
        assert op.is_diag(freq=False)
        assert not op.is_diag(freq=True)

    def test_gram_diag_matches_operator(self):
        # For circular conv, K^T K x == ifft(|FB|^2 fft(x))
        x = Variable()
        psf = np.random.RandomState(5).rand(5, 5).astype(np.float32)
        op = dp.conv(x, psf)
        m = rand((1, 1, 16, 16))
        KtKm = lin_adjoint(op, lin_eval(op, m))
        gd = op.gram_diag((1, 1, 16, 16), freq=True)
        via_diag = jnp.real(jnp.fft.ifftn(gd * jnp.fft.fftn(m, axes=(-2, -1)), axes=(-2, -1)))
        assert np.allclose(np.asarray(KtKm), np.asarray(via_diag), atol=1e-4)


class TestAutodiffThroughGraph:
    def test_grad_flows(self):
        x = Variable()
        psf = np.ones((3, 3), np.float32) / 9
        op = dp.conv(x, psf)

        def loss(m):
            return jnp.sum(lin_eval(op, m) ** 2)

        g = jax.grad(loss)(rand((1, 1, 8, 8)))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_grad_flows_to_placeholder_psf(self):
        x = Variable()
        ph = Placeholder("psf")
        op = dp.conv_doe(x, ph)
        m = rand((1, 1, 8, 8))

        def loss(psf):
            return jnp.sum(lin_eval(op, m, {"psf": psf}) ** 2)

        g = jax.grad(loss)(np.random.RandomState(1).rand(1, 1, 3, 3).astype(np.float32))
        assert float(jnp.abs(g).sum()) > 0
