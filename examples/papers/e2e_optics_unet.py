"""End-to-end deep-optics baseline: DOE + U-Net reconstructor.

Counterpart of /root/reference/examples/papers/deltaprox_siggraph_2023/
computional_optics/e2e_optics_unet.py: instead of a proximal solver,
the reconstruction network is a plain U-Net; the DOE height map and the
U-Net weights are optimized jointly by differentiating through the PSF
simulation and the sensor model. One jitted update step here (optax),
versus the reference's torch AdamW loop.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from dprox_tpu.contrib.optic import DOEModelConfig, U_Net, build_doe_model, img_psf_conv
from dprox_tpu.utils import imaging, metrics


def main(steps: int = 30, patch: int = 64, sigma: float = 7.65 / 255):
    config = DOEModelConfig(
        patch_size=patch, wave_resolution=(patch * 2, patch * 2),
        sample_interval=2e-6 * 1496 / (patch * 2))
    doe = build_doe_model(config)
    unet = U_Net(base_features=8)

    gt = imaging.sample("face")[:, :, :patch, :patch]
    gt_nhwc = jnp.transpose(gt, (0, 2, 3, 1))

    params = {
        "doe": doe.init_params(),
        "unet": unet.init(jax.random.key(0), gt_nhwc),
    }

    def step_fn(params, key):
        psf = doe.get_psf(params["doe"])
        inp = img_psf_conv(gt, psf, circular=config.circular)
        inp = inp + sigma * jax.random.normal(key, inp.shape)
        out = unet.apply(params["unet"], jnp.transpose(inp, (0, 2, 3, 1)))
        return jnp.mean((out - gt_nhwc) ** 2)

    tx = optax.adamw(1e-3, weight_decay=1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, key):
        loss, g = jax.value_and_grad(step_fn)(params, key)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(1)
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = update(params, opt_state, sub)
        if i % 10 == 0:
            print(f"step {i}: loss {float(loss):.6f}")

    # final eval
    psf = doe.get_psf(params["doe"])
    inp = img_psf_conv(gt, psf, circular=config.circular)
    out = unet.apply(params["unet"], jnp.transpose(inp, (0, 2, 3, 1)))
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    print(f"input  PSNR {metrics.psnr(np.asarray(inp), gt):.2f} dB")
    print(f"output PSNR {metrics.psnr(out, gt):.2f} dB  "
          f"SSIM {metrics.ssim(np.clip(out, 0, 1), gt):.4f}")


if __name__ == "__main__":
    main()
