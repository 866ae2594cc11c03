"""Deraining with an unrolled PGD and a learnable degradation operator.

Counterpart of /root/reference/examples (derain) and
tests/problem/test_deraining.py: unrolled_prior (DGUNet proximal net) +
LearnableDegOp as the step-indexed forward model, 7 PGD iterations.
Without the pretrained Rain100H weights this runs the architecture
end-to-end on synthetic rain streaks (random init).
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.contrib.derain import LearnableDegOp
from dprox_tpu.models.dgu import DGUDenoiser
from dprox_tpu.utils import imaging, metrics


def synthetic_rain(img, key, density=0.05, length=8):
    """Draw diagonal streaks deterministically."""
    H, W = img.shape[-2:]
    k1, k2 = jax.random.split(key)
    drops = (jax.random.uniform(k1, (1, 1, H, W)) < density).astype(jnp.float32)
    kernel = jnp.eye(length)[None, None] / length
    streaks = jax.lax.conv_general_dilated(drops, kernel, (1, 1), "SAME")
    return jnp.clip(img + streaks, 0, 1)


def main(train_steps: int = 200):
    img = imaging.sample("face")[:, :, :64, :64]
    rainy = synthetic_rain(img, jax.random.key(0))

    max_iter = 7
    deg = LearnableDegOp(max_step=max_iter - 2)
    x = dp.Variable()
    A = deg.as_linop(x)
    data_term = dp.sum_squares(A, b=dp.Placeholder("rainy"))
    prior = dp.unrolled_prior(x, DGUDenoiser(n_feat=16, scale_unetfeats=8,
                                             scale_orsnetfeats=8),
                              max_step=max_iter, param_key="dgu")
    solver = dp.compile([data_term, prior], method="pgd")

    # joint bi-level training (the SIGGRAPH derain setup): gradients flow
    # into the degradation operator, the DGUNet proximal network and the
    # unrolled schedules simultaneously
    import optax

    params = {"deg_op": deg.params, "dgu": prior.params,
              "rhos": jnp.full((max_iter,), 0.5),
              "lams": jnp.full((max_iter,), 0.1)}

    def solve(p):
        return solver.solve(x0=rainy, max_iter=max_iter, rhos=p["rhos"],
                            lams=p["lams"],
                            params={"rainy": rainy, "deg_op": p["deg_op"],
                                    "dgu": p["dgu"]})

    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def update(p, s):
        loss, g = jax.value_and_grad(
            lambda pp: jnp.mean((solve(pp) - img) ** 2))(p)
        upd, s = tx.update(g, s)
        return optax.apply_updates(p, upd), s, loss

    before = solve(params)
    for i in range(train_steps):
        params, opt_state, loss = update(params, opt_state)
    after = solve(params)

    print(f"rainy PSNR:            {metrics.psnr(rainy, img):.2f} dB")
    print(f"untrained output PSNR: {metrics.psnr(before, img):.2f} dB")
    print(f"after {train_steps} joint steps:  {metrics.psnr(after, img):.2f} dB")

    shipped_weights_demo()


def shipped_weights_demo():
    """The converged joint weights (weights/derain_joint.msgpack,
    scripts/train_derain.py: 2000 TPU steps on randomized synthetic
    rain; held-out 22.96 -> 31.37 dB, goldens in
    tests/test_training.py::test_trained_derain_golden)."""
    from flax import serialization

    path = os.path.join(os.path.dirname(__file__), "..", "..", "weights",
                        "derain_joint.msgpack")
    if not os.path.exists(path):
        print("(no shipped derain_joint.msgpack — skipping trained demo)")
        return
    sys.path.insert(0, os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "..", "scripts")))
    import train_derain as T

    solver, params = T.build()
    with open(path, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    gt = jnp.asarray(T.hopper_crops(n=1))
    rainy = T.synthetic_rain(gt, jax.random.key(500))
    out = T.solve(solver, params, rainy)
    print(f"trained pipeline (shipped weights, held-out crop): "
          f"{metrics.psnr(np.asarray(rainy), np.asarray(gt)):.2f} -> "
          f"{metrics.psnr(np.clip(np.asarray(out), 0, 1), np.asarray(gt)):.2f} dB")


if __name__ == "__main__":
    main()
