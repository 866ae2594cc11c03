"""CS-MRI with a deep-equilibrium solver (forward Anderson fixed point,
implicit adjoint backward) + learned (r, l) multipliers.

Counterpart of /root/reference/tests/paper/test_csmri.py:157-222 (DEQ
variants) and algo/specialization/deq. Offline-safe with the TV prior.
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


def main(train_steps: int = 5):
    s = csmri.generate_sample(size=64, num_lines=40)
    x = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    data = dp.csmri(x, mask, y)
    reg = dp.deep_prior(x, "tv", sqrt=True)
    solver = dp.compile(data + reg, method="admm")
    deq = dp.specialize(solver, method="deq", learned_params=True,
                        f_thres=30, b_thres=30)

    x0 = np.real(s["x0"]).astype(np.float32)
    gt = jnp.asarray(s["gt"])
    params = deq.init_params()

    def loss_fn(p):
        out = deq.solve(x0=x0, rhos=0.5, lams=0.02,
                        params={**p, **s["params"]})
        return jnp.mean((jnp.real(out) - gt) ** 2)

    out0 = deq.solve(x0=x0, rhos=0.5, lams=0.02, params={**params, **s["params"]})
    print(f"zero-filled PSNR: {metrics.psnr(x0, s['gt']):.2f} dB")
    print(f"DEQ (r=l=1)  PSNR: {metrics.psnr(np.real(np.asarray(out0)), s['gt']):.2f} dB")

    tx = optax.adam(5e-2)
    opt_state = tx.init(params)
    step = jax.jit(lambda p, o: _update(p, o))

    def _update(p, o):
        val, g = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(g, o)
        return optax.apply_updates(p, updates), o, val

    for i in range(train_steps):
        params, opt_state, val = _update(params, opt_state)
        print(f"step {i}: loss {float(val):.5f} r={float(params['deq_r']):.3f} "
              f"l={float(params['deq_l']):.3f}")

    out = deq.solve(x0=x0, rhos=0.5, lams=0.02, params={**params, **s["params"]})
    print(f"DEQ (learned) PSNR: {metrics.psnr(np.real(np.asarray(out)), s['gt']):.2f} dB")


if __name__ == "__main__":
    main()
