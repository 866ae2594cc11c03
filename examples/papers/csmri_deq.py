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

    shipped_weights_demo()


def shipped_weights_demo():
    """The task-scale trained DEQ (weights/deq_csmri.msgpack,
    scripts/train_deq_csmri.py): prior finetuned through the equilibrium;
    beats noise-matched PnP at the same 24-iteration budget (goldens:
    tests/paper/test_csmri_grid.py::test_trained_deq_grid)."""
    from flax import serialization

    from dprox_tpu.proxfn.pnp.prior import get_denoiser

    path = os.path.join(os.path.dirname(__file__), "..", "..", "weights",
                        "deq_csmri.msgpack")
    if not os.path.exists(path):
        print("(no shipped deq_csmri.msgpack — skipping trained-DEQ demo)")
        return
    den = get_denoiser("distilled_gray")  # r5 weights trained from this init
    x = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    reg = dp.deep_prior(x, den, sqrt=True, param_key="deq_prior")
    solver = dp.compile(dp.csmri(x, mask, y) + reg, method="admm")
    deq = dp.specialize(solver, method="deq", learned_params=True,
                        f_thres=24, b_thres=16)
    params = {"deq_r": np.float32(1.0), "deq_l": np.float32(1.0),
              "deq_prior": den.params}
    with open(path, "rb") as f:
        params = serialization.from_bytes(params, f.read())

    s = csmri.generate_sample(size=128, num_lines=40, sigma=0.05)
    out = deq.solve(x0=np.real(s["x0"]).astype(np.float32), rhos=0.3,
                    lams=0.05, params={**params, **s["params"]},
                    real_output=True)
    print(f"trained DEQ (shipped weights, 40 lines, sigma 0.05): "
          f"{metrics.psnr(np.asarray(out), s['gt']):.2f} dB "
          f"(zero-filled {metrics.psnr(np.real(s['x0']), s['gt']):.2f})")


if __name__ == "__main__":
    main()
