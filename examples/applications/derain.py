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


def main():
    img = imaging.sample("face")[:, :, :128, :128]
    rainy = synthetic_rain(img, jax.random.key(0))

    max_iter = 7
    deg = LearnableDegOp(max_step=max_iter - 2)
    x = dp.Variable()
    A = deg.as_linop(x)
    data_term = dp.sum_squares(A, b=dp.Placeholder("rainy"))
    reg_term = dp.unrolled_prior(x, DGUDenoiser(n_feat=16, scale_unetfeats=8,
                                                scale_orsnetfeats=8),
                                 max_step=max_iter)
    solver = dp.compile([data_term, reg_term], method="pgd")

    out = solver.solve(x0=rainy, max_iter=max_iter, rhos=0.5, lams=0.1,
                       params={"rainy": rainy, "deg_op": deg.params})
    print(f"rainy PSNR: {metrics.psnr(rainy, img):.2f} dB")
    print(f"output PSNR: {metrics.psnr(out, img):.2f} dB "
          f"(random-init networks; training required for gains)")


if __name__ == "__main__":
    main()
