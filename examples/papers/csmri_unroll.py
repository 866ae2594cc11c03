"""CS-MRI with an unrolled solver: learned per-iteration (rho, sigma).

Counterpart of /root/reference/examples/papers/deltaprox_siggraph_2023/
csmri/unroll_unet.py: specialize(solver, 'unroll') with unshared
per-iteration hyperparameters, trained by backprop through the whole
scanned solver on synthetic radial-mask CS-MRI samples. Offline-safe
with the TV prior (swap in deep_prior(x, 'unet') when pretrained
weights are cached).
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import dprox_tpu as dp
from dprox_tpu.contrib import csmri
from dprox_tpu.utils import metrics


def main(train_steps: int = 30, max_iter: int = 8):
    s = csmri.generate_sample(size=64, num_lines=40)
    x = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    data = dp.csmri(x, mask, y)
    reg = dp.deep_prior(x, "tv", sqrt=True)
    solver = dp.compile(data + reg, method="admm")
    unrolled = dp.specialize(solver, method="unroll", share=False,
                             max_iter=max_iter, learned_params=True,
                             rhos=0.5, lams=0.02)

    x0 = np.real(s["x0"]).astype(np.float32)
    gt = jnp.asarray(s["gt"])
    params = unrolled.init_params()

    def loss_fn(p):
        out = unrolled.solve(x0=x0, params={**p, **s["params"]})
        return jnp.mean((jnp.real(out) - gt) ** 2)

    out0 = unrolled.solve(x0=x0, params={**params, **s["params"]})
    print(f"zero-filled PSNR:        {metrics.psnr(x0, s['gt']):.2f} dB")
    print(f"unrolled (init)  PSNR:   "
          f"{metrics.psnr(np.real(np.asarray(out0)), s['gt']):.2f} dB")

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(5e-3))
    opt_state = tx.init(params)

    @jax.jit
    def update(p, o):
        val, g = jax.value_and_grad(loss_fn)(p)
        upd, o = tx.update(g, o)
        return optax.apply_updates(p, upd), o, val

    for i in range(train_steps):
        params, opt_state, val = update(params, opt_state)
        if i % 5 == 0:
            print(f"step {i}: loss {float(val):.6f}")

    out = unrolled.solve(x0=x0, params={**params, **s["params"]})
    print(f"unrolled (trained) PSNR: "
          f"{metrics.psnr(np.real(np.asarray(out)), s['gt']):.2f} dB")
    print("learned rhos:", np.round(np.asarray(params['unroll_rhos']), 4))


if __name__ == "__main__":
    main()
