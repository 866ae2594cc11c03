"""Property tests over random linop expression trees + structural perf
guards.

The reference validates individual linops with the dot-product test
(linop/comp_graph.py:342-371); here random compositions of the whole op
algebra are fuzzed through the same oracle, and the compiled ADMM scan
body is checked structurally (FFT count) so perf regressions in the hot
loop fail loudly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dprox_tpu as dp
from dprox_tpu.utils import imaging


def _random_expr(rng, x, depth, H):
    """Random expression tree over the op algebra rooted at variable x."""
    if depth == 0:
        return x
    k = rng.randint(6)
    child = _random_expr(rng, x, depth - 1, H)
    if k == 0:
        psf = imaging.point_spread_function(rng.choice([3, 5, 7]),
                                            rng.rand() * 2 + 0.5)
        return dp.conv(child, psf)
    if k == 1:
        return dp.grad(child, rng.randint(2))
    if k == 2:
        return float(rng.rand() * 2 - 1) * child
    if k == 3:
        return dp.mosaic(child)
    if k == 4:
        w = rng.rand(1, 3, H, H).astype(np.float32)
        return dp.mul_elementwise(child, w)
    # sum of two subtrees (shared variable -> shared-subexpression
    # adjoint accumulation)
    other = _random_expr(rng, x, depth - 1, H)
    return child + other


@pytest.mark.parametrize("seed", range(8))
def test_random_expression_adjoint(seed):
    rng = np.random.RandomState(seed)
    H = 16
    x = dp.Variable()
    expr = _random_expr(rng, x, depth=rng.randint(1, 4), H=H)
    assert dp.validate(expr, shape=(1, 3, H, H)), repr(expr)


@pytest.mark.parametrize("seed", range(4))
def test_random_expression_gram_diag_consistency(seed):
    """Where the tree claims (freq-)diagonality, the claimed diagonal
    must match the actual Gram operator action on a random vector."""
    rng = np.random.RandomState(100 + seed)
    H = 16
    x = dp.Variable()
    # compositions of conv/scale/sum keep freq-diagonality
    expr = dp.conv(x, imaging.point_spread_function(5, 1.5))
    if seed % 2:
        expr = float(rng.rand() + 0.5) * expr
    if seed >= 2:
        expr = expr + dp.conv(x, imaging.point_spread_function(3, 1.0))
    assert expr.is_gram_diag(freq=True)
    v = rng.rand(1, 3, H, H).astype(np.float32)
    shape = (1, 3, H, H)
    diag = expr.gram_diag(shape, None, freq=True)
    Fv = jnp.fft.fftn(jnp.asarray(v), axes=(-2, -1))
    via_diag = jnp.real(jnp.fft.ifftn(diag * Fv, axes=(-2, -1)))
    KtKv = dp.adjoint(expr, dp.eval(expr, v))
    assert np.allclose(np.asarray(via_diag), np.asarray(KtKv), atol=1e-3)


def test_admm_scan_body_structure():
    """Structural perf guard: the jitted deconv ADMM body must contain
    exactly one fft/ifft pair per iteration (the x-update) and no
    transfers — more FFTs means hoisting broke."""
    img = imaging.sample("face")[:, :, :32, :32]
    psf = imaging.point_spread_function(5, 2)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b), dp.nonneg(x)],
                        "admm")
    rhos, lams = solver.defaults(0.05, 0.01, 6)
    run = solver._get_jitted(False)
    jaxpr = jax.make_jaxpr(lambda bb: run(bb, rhos, lams, {}))(b)
    text = str(jaxpr)
    import re

    scan_body = text[text.index("scan["):]
    # FFT ops appear either inline ("fft[fft_type=...") or as references
    # to hoisted named sub-jaxprs ("jit[name=fft jaxpr=fft]")
    n_fft = (len(re.findall(r"fft\[fft_", scan_body)) +
             len(re.findall(r"jaxpr=fft1?\]", scan_body)))
    assert n_fft == 2, f"expected 1 fft+ifft pair in the scan body, got {n_fft}"
