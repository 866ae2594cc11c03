"""Joint demosaic + deconvolution DOE co-design (CG-path bi-level training).

Counterpart of /root/reference/examples/papers/deltaprox_siggraph_2023/
computional_optics/e2e_optics_dprox_joint.py: the sensor model is
``mosaic(conv_doe(x, PSF))`` — a Bayer-mosaicked measurement through the
learned optic — so the stacked data-term linop is NOT frequency-diagonal
and the ADMM x-update runs the matrix-free CG solver. Gradients flow
through the CG iterations (and the PSF simulation) into the DOE height
map and the per-iteration schedules.
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


def main(steps: int = 15, patch: int = 64, sigma: float = 7.65 / 255,
         max_iter: int = 5):
    config = DOEModelConfig(
        patch_size=patch, wave_resolution=(patch * 2, patch * 2),
        sample_interval=2e-6 * 1496 / (patch * 2))
    model = build_doe_model(config)

    x = dp.Variable()
    y = dp.Placeholder("y")
    psf_ph = dp.Placeholder("psf")
    data_term = dp.sum_squares(
        dp.mosaic(dp.conv_doe(x, psf_ph, circular=config.circular)), b=y)
    reg_term = dp.deep_prior(x, "tv")
    solver = dp.compile(
        data_term + reg_term, method="admm",
        linear_solve_config=dp.LinearSolveConfig(max_iters=10,
                                                 use_analytic_grad=False))

    rhos0, sigmas0 = dp.log_descent(49, 7.65, max_iter,
                                    sigma=max(0.255 / 255, sigma))
    params = {"height_map_sqrt": model.init_params()["height_map_sqrt"],
              "rhos": rhos0, "sigmas": sigmas0}

    gt = imaging.sample("face")[:, :, :patch, :patch]

    def step_fn(params, key):
        psf = model.get_psf({"height_map_sqrt": params["height_map_sqrt"]})
        inp = img_psf_conv(gt, psf, circular=config.circular)
        inp = imaging.mosaicing(inp)
        inp = inp + sigma * jax.random.normal(key, inp.shape)
        # x0: mosaicked measurement is already a plausible RGB init
        out = solver.solve(x0=inp, rhos=params["rhos"],
                           lams=params["sigmas"], max_iter=max_iter,
                           params={"psf": psf, "y": inp})
        return jnp.mean((out - gt) ** 2)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-3))
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
        print(f"step {i}: loss {float(loss):.6f} "
              f"psnr {-10 * np.log10(max(float(loss), 1e-12)):.2f} dB",
              flush=True)


if __name__ == "__main__":
    main()
