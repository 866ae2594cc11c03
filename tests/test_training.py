"""End-to-end training: unrolled solver + optax loop + checkpoint/resume."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dprox_tpu as dp
from dprox_tpu.algo.special import UnrolledSolver, train_supervised
from dprox_tpu.utils import imaging, metrics


def _setup():
    img = imaging.sample("face")[:, :, :32, :32]
    psf = imaging.point_spread_function(5, 2)
    b = imaging.blurring(img, psf)
    x = dp.Variable()
    data = dp.sum_squares(dp.conv(x, psf) - b)
    reg = dp.norm1(dp.grad(x, 0))
    solver = dp.compile([data, reg], method="admm")
    return img, b, UnrolledSolver(solver, max_iter=4, learned_params=True,
                                  rhos=0.5, lams=0.05)


def test_train_unrolled_schedules_improve(tmp_path):
    img, b, us = _setup()
    params0 = us.init_params()

    def step_fn(params, batch, key):
        out = us.solve(x0=batch["b"], params=params)
        return jnp.mean((out - batch["gt"]) ** 2)

    dataset = [{"b": b, "gt": img}] * 4

    def eval_fn(params):
        out = us.solve(x0=b, params=params)
        return metrics.psnr(out, img)

    before = eval_fn(params0)
    params = train_supervised(step_fn, dataset, params0, epochs=4, lr=5e-3,
                              savedir=str(tmp_path), eval_fn=eval_fn,
                              log_every=0)
    after = eval_fn(params)
    assert after > before, (before, after)

    # resume restores counters + params without error
    params2 = train_supervised(step_fn, dataset, params0, epochs=5, lr=5e-3,
                               savedir=str(tmp_path), resume=True,
                               eval_fn=eval_fn, log_every=0)
    assert np.isfinite(eval_fn(params2))


def test_nan_step_is_skipped():
    img, b, us = _setup()
    params0 = us.init_params()
    calls = {"n": 0}

    def step_fn(params, batch, key):
        # poison every second step with NaN
        out = us.solve(x0=batch["b"], params=params)
        loss = jnp.mean((out - batch["gt"]) ** 2)
        return jnp.where(batch["poison"], jnp.nan, loss)

    dataset = [{"b": b, "gt": img, "poison": np.array(i % 2 == 1)}
               for i in range(4)]
    params = train_supervised(step_fn, dataset, params0, epochs=1, lr=1e-2,
                              log_every=0)
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_derain_joint_training_step():
    """Joint bi-level training of the derain pipeline: gradients flow into
    the learnable degradation operator, the DGUNet proximal network and
    the unrolled schedules simultaneously (the SIGGRAPH derain setup)."""
    from dprox_tpu.contrib.derain import LearnableDegOp
    from dprox_tpu.models.dgu import DGUDenoiser

    img = imaging.sample("face")[:, :, :32, :32]
    rainy = jnp.clip(img + 0.1, 0, 1)

    max_iter = 3
    deg = LearnableDegOp(max_step=max_iter - 2)
    x = dp.Variable()
    data = dp.sum_squares(deg.as_linop(x), b=dp.Placeholder("rainy"))
    prior = dp.unrolled_prior(x, DGUDenoiser(n_feat=8, scale_unetfeats=4,
                                             scale_orsnetfeats=4),
                              max_step=max_iter, param_key="dgu")
    solver = dp.compile([data, prior], method="pgd")

    # perturb away from the stability-oriented zero-inits (SAM image
    # branch, tail): at exactly zero the output is constant in the
    # upstream params, so gradient FLOW cannot be observed there
    leaves, treedef = jax.tree.flatten(prior.params)
    keys = jax.random.split(jax.random.key(0), len(leaves))
    dgu0 = treedef.unflatten([
        l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])
    params0 = {"deg_op": deg.params, "dgu": dgu0,
               "rhos": jnp.full((max_iter,), 0.5),
               "lams": jnp.full((max_iter,), 0.1)}

    def loss_fn(p):
        out = solver.solve(x0=rainy, max_iter=max_iter, rhos=p["rhos"],
                           lams=p["lams"],
                           params={"rainy": rainy, "deg_op": p["deg_op"],
                                   "dgu": p["dgu"]})
        return jnp.mean((out - img) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(params0)
    assert np.isfinite(float(loss))
    # lams carries no gradient by design: unrolled_prior's prox ignores
    # lam (reference: unrolling/prior.py:18-23)
    for name in ("deg_op", "dgu", "rhos"):
        total = sum(float(jnp.abs(t).sum()) for t in jax.tree.leaves(g[name]))
        assert np.isfinite(total) and total > 0, name


# (held-out hopper crop index, rainy PSNR, derained PSNR) pinned from
# scripts/train_derain.py: 2000 TPU steps of joint training — unrolled
# 7-iteration PGD with the DGUNet proximal network and the learnable
# degradation operator on randomized synthetic rain; heldout mean
# 22.96 -> 31.37 dB, CPU re-eval identical to 0.01 dB. Reference
# counterpart: tests/problem/test_deraining.py:31-33 (35.92 dB with
# HF-pretrained Rain100H weights — unavailable offline).
DERAIN_GOLDEN = [(0, 22.54, 31.01), (4, 21.77, 33.96)]


@pytest.mark.parametrize("crop_idx,rainy_psnr,expected", DERAIN_GOLDEN)
def test_trained_derain_golden(crop_idx, rainy_psnr, expected):
    """The shipped jointly-trained derain pipeline
    (weights/derain_joint.msgpack) must restore held-out rainy crops to
    the pinned PSNR (>= +8 dB over the rainy input on these crops)."""
    import os
    import sys

    from flax import serialization

    scripts = os.path.join(os.path.dirname(__file__), "..", "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    import train_derain as T

    solver, params = T.build()
    path = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "derain_joint.msgpack")
    with open(path, "rb") as f:
        params = serialization.from_bytes(params, f.read())

    gt = jnp.asarray(T.hopper_crops()[crop_idx])[None]
    rainy = T.synthetic_rain(gt, jax.random.key(500 + crop_idx))
    out = T.solve(solver, params, rainy)
    p_in = metrics.psnr(np.asarray(rainy), np.asarray(gt))
    p_out = metrics.psnr(np.clip(np.asarray(out), 0, 1), np.asarray(gt))
    assert p_in == pytest.approx(rainy_psnr, abs=0.1), p_in
    assert p_out == pytest.approx(expected, abs=0.15), p_out
    assert p_out - p_in >= 8.0, (p_out, p_in)
