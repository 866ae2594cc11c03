"""Pallas kernels vs jnp reference oracles (interpret-compatible on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dprox_tpu.ops.pallas_kernels import (_admm_update_ref, _freq_divide_ref,
                                          bdot_pallas, freq_divide,
                                          fused_admm_update)


def test_fused_admm_update_matches_ref():
    rng = np.random.RandomState(0)
    Kx = jnp.asarray(rng.randn(1, 3, 16, 128).astype(np.float32))
    u = jnp.asarray(rng.randn(1, 3, 16, 128).astype(np.float32))
    for kind in ("nonneg", "soft"):
        v_ref, u_ref = _admm_update_ref(Kx, u, 0.1, kind)
        v, unew = fused_admm_update(Kx, u, 0.1, kind)  # jnp fallback on CPU
        assert np.allclose(np.asarray(v), np.asarray(v_ref))
        assert np.allclose(np.asarray(unew), np.asarray(u_ref))


def test_freq_divide_matches_ref():
    rng = np.random.RandomState(1)
    F = jnp.asarray((rng.randn(1, 3, 16, 128) + 1j * rng.randn(1, 3, 16, 128)).astype(np.complex64))
    d = jnp.asarray(rng.rand(1, 3, 16, 128).astype(np.float32)) + 0.5
    out = freq_divide(F, d, 0.3)
    ref = _freq_divide_ref(F, d, 0.3)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bdot_matches():
    rng = np.random.RandomState(2)
    p = jnp.asarray(rng.randn(4, 3, 8, 128).astype(np.float32))
    q = jnp.asarray(rng.randn(4, 3, 8, 128).astype(np.float32))
    out = bdot_pallas(p, q)
    ref = jnp.sum(p.reshape(4, -1) * q.reshape(4, -1), axis=1)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_bsr_matvec_kernel_interpret():
    """Run the actual Pallas BSR kernel in interpret mode vs the ref."""
    import scipy.sparse as sp

    from dprox_tpu.ops.pallas_kernels import _bsr_matvec_ref, bsr_matvec

    rng = np.random.RandomState(4)
    A = sp.random(256, 384, density=0.08, random_state=rng, format="csr")
    from dprox_tpu.algo.lp.utils import BSRMat

    op = BSRMat(A, bm=128, bn=128, dtype=jnp.float32)
    x = jnp.asarray(rng.rand(384).astype(np.float32))
    xb = jnp.pad(x, (0, op.Nb * 128 - 384)).reshape(op.Nb, 128)
    ref = _bsr_matvec_ref(op.tiles, op.col_ids, op.row_ids, xb, op.Mb)
    out = bsr_matvec(op.tiles, op.col_ids, op.row_ids, xb, op.Mb,
                     interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ref.reshape(-1)[:256]), A @ np.asarray(x), rtol=1e-5)
    # transpose direction through the same kernel
    y = jnp.asarray(rng.rand(256).astype(np.float32))
    yb = jnp.pad(y, (0, op.Mb * 128 - 256)).reshape(op.Mb, 128)
    outT = bsr_matvec(op.tilesT, op.row_idsT, op.col_idsT, yb, op.Nb,
                      interpret=True)
    np.testing.assert_allclose(
        np.asarray(outT.reshape(-1)[:384]), A.T @ np.asarray(y),
        rtol=1e-4, atol=1e-5)


def test_fused_cg_tail_kernel_interpret():
    """The actual Pallas fused-CG-tail kernel (interpret mode) matches
    the jnp reference for a batch of states."""
    from dprox_tpu.ops.pallas_kernels import _cg_tail_ref, fused_cg_tail

    rng = np.random.RandomState(5)
    shp = (2, 3, 16, 128)
    x, r, p, Ap = (jnp.asarray(rng.randn(*shp).astype(np.float32))
                   for _ in range(4))
    rs = jnp.sum(r.reshape(2, -1) ** 2, axis=1)
    ref = _cg_tail_ref(x, r, p, Ap, rs)
    out = fused_cg_tail(x, r, p, Ap, rs, interpret=True)
    for a, b in zip(out, ref):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                           atol=1e-4), np.abs(np.asarray(a) - np.asarray(b)).max()


def test_cg_pallas_solver_matches_cg():
    """cg_pallas (fused-tail variant) solves the same SPD system to the
    same solution as plain cg (jnp fallback path on CPU)."""
    from dprox_tpu.linalg.solvers import cg, cg_pallas

    rng = np.random.RandomState(6)
    M = rng.randn(8, 8).astype(np.float32)
    A_mat = jnp.asarray(M @ M.T + 8 * np.eye(8, dtype=np.float32))
    b = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    A = lambda v: v @ A_mat.T
    x_ref = cg(A, b, rtol=1e-8, max_iters=50)
    x_new = cg_pallas(A, b, rtol=1e-8, max_iters=50)
    assert np.allclose(np.asarray(x_new), np.asarray(x_ref), atol=1e-5)


def test_tv_denoise_chw_pallas_interpret():
    """The fused TV kernel (interpret mode) matches tv_denoising_chw
    exactly — multi-stripe, lane-padded widths, image edges, and the
    TVDenoiser wrapper gate."""
    import numpy as np
    import jax.numpy as jnp
    from dprox_tpu.models.tv import tv_denoising_chw
    from dprox_tpu.ops.pallas_kernels import tv_denoise_chw_pallas

    rng = np.random.RandomState(0)
    for (c, h, w), it, tile in [((3, 40, 56), 4, 32), ((2, 300, 260), 10, 128),
                                ((3, 20, 20), 5, 48), ((1, 128, 384), 10, 128)]:
        y = jnp.asarray(rng.rand(c, h, w).astype(np.float32))
        ref = tv_denoising_chw(y, 0.08, it)
        got = tv_denoise_chw_pallas(y, 0.08, it, tile=tile, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


def test_tv_pallas_wrapper_toggle(monkeypatch):
    """DPROX_TV_PALLAS=1 routes TVDenoiser through the kernel (interpret
    fallback is the jnp path off-TPU, so force via the kernel arg)."""
    import numpy as np
    import jax.numpy as jnp
    from dprox_tpu.proxfn.pnp.denoisers import TVDenoiser

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 3, 33, 47).astype(np.float32))
    den = TVDenoiser(5)
    monkeypatch.setenv("DPROX_TV_PALLAS", "0")
    ref = den.denoise(x, 0.1)
    monkeypatch.setenv("DPROX_TV_PALLAS", "1")
    got = den.denoise(x, 0.1)  # off-TPU the kernel falls back to jnp
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
