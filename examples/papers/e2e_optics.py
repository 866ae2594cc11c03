"""End-to-end DOE + unrolled-solver co-design (bi-level training).

Counterpart of /root/reference/examples/papers/deltaprox_siggraph_2023/
computional_optics/e2e_optics_dprox.py: the DOE height map and the
per-iteration (rho, sigma) schedules are optimized jointly by
differentiating through PSF simulation, the conv_doe data term, and 10
unrolled ADMM iterations — all one jitted graph here.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import dprox_tpu as dp
from dprox_tpu.contrib.optic import DOEModelConfig, build_doe_model, img_psf_conv
from dprox_tpu.utils import imaging, metrics


def main(steps: int = 20, patch: int = 64):
    config = DOEModelConfig(patch_size=patch, wave_resolution=(patch * 2, patch * 2),
                            sample_interval=2e-6 * 1496 / (patch * 2))
    model = build_doe_model(config)

    x = dp.Variable()
    psf_ph = dp.Placeholder("psf")
    y_ph = dp.Placeholder("y")
    data_term = dp.sum_squares(dp.conv_doe(x, psf_ph, circular=True), b=y_ph)
    reg_term = dp.deep_prior(x, "tv")
    solver = dp.compile(data_term + reg_term, method="admm")

    rhos0, sigmas0 = dp.log_descent(49, 7.65, 10)
    params = {"height_map_sqrt": model.init_params()["height_map_sqrt"],
              "rhos": rhos0, "sigmas": sigmas0}

    img = imaging.sample("face")[:, :, :patch, :patch]

    def step_fn(params, key):
        psf = model.get_psf({"height_map_sqrt": params["height_map_sqrt"]})
        inp = img_psf_conv(img, psf, circular=True)
        inp = inp + 0.01 * jax.random.normal(key, inp.shape)
        out = solver.solve(x0=inp, rhos=params["rhos"], lams=params["sigmas"],
                           max_iter=10, params={"psf": psf, "y": inp})
        return jnp.mean((out - img) ** 2)

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, key):
        loss, g = jax.value_and_grad(step_fn)(params, key)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(0)
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = update(params, opt_state, sub)
        if i % 5 == 0:
            print(f"step {i}: loss {float(loss):.6f} "
                  f"psnr {10*np.log10(1/float(loss)):.2f} dB")
    print("final loss:", float(loss))

    shipped_weights_demo()


def shipped_weights_demo():
    """The shipped trained DOE (weights/doe_codesign.msgpack,
    scripts/train_doe.py): co-designed optic +7.68 dB mean over the
    tuned fixed Fresnel lens on held-out crops (goldens:
    tests/test_optics.py::test_trained_doe_codesign)."""
    import sys

    from flax import serialization

    from dprox_tpu.contrib.optic import build_baseline_height_map_sqrt
    from dprox_tpu.utils import metrics

    path = os.path.join(os.path.dirname(__file__), "..", "..", "weights",
                        "doe_codesign.msgpack")
    if not os.path.exists(path):
        print("(no shipped doe_codesign.msgpack — skipping trained demo)")
        return
    sys.path.insert(0, os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "..", "scripts")))
    import train_doe as T

    config, model, solver = T.build()
    rhos0, sigmas0 = T.hand_schedule()
    params = {"height_map_sqrt": model.init_params()["height_map_sqrt"],
              "rhos": rhos0, "sigmas": sigmas0}
    with open(path, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    gt = jnp.asarray(T.hopper_crops(n=1))
    recon = T.make_reconstruct(model, solver)
    out_c = recon(params["height_map_sqrt"], gt, params["rhos"],
                  params["sigmas"], jax.random.key(100))
    out_f = recon(jnp.asarray(build_baseline_height_map_sqrt(model)), gt,
                  rhos0, sigmas0, jax.random.key(100))
    pc = metrics.psnr(np.clip(np.asarray(out_c), 0, 1), np.asarray(gt))
    pf = metrics.psnr(np.clip(np.asarray(out_f), 0, 1), np.asarray(gt))
    print(f"trained DOE (shipped weights, held-out crop): "
          f"fresnel {pf:.2f} dB -> co-designed {pc:.2f} dB")


if __name__ == "__main__":
    main()
