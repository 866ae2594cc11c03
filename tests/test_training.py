"""End-to-end training: unrolled solver + optax loop + checkpoint/resume."""
import numpy as np
import jax
import jax.numpy as jnp

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
