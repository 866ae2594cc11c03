"""CS-MRI with the RL hyperparameter tuner.

Counterpart of /root/reference/examples (tfpnp-based RL tuning) using
the in-repo AutoTuneSolver: a ResNet policy emits (rho bundle, per-psi
sigmas, stop prob) every action_pack iterations and is optimized by
direct backprop through solve episodes.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.algo.special import AutoTuneSolver
from dprox_tpu.contrib import csmri
from dprox_tpu.utils import metrics


def main(train_steps: int = 6):
    samples = [csmri.generate_sample(size=64, num_lines=nl, seed=i)
               for i, nl in enumerate([30, 40, 50])]
    x = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    data = dp.csmri(x, mask, y)
    reg = dp.deep_prior(x, "tv", sqrt=True)
    solver = dp.compile(data + reg, method="admm")
    tuner = AutoTuneSolver(solver, action_pack=3, max_episode_step=3)

    s = samples[1]
    x0 = np.real(s["x0"]).astype(np.float32)

    def run(params=None):
        out = tuner.solve(x0, params=params, solve_params=dict(s["params"]))
        return metrics.psnr(np.real(np.asarray(out)), s["gt"])

    print(f"zero-filled PSNR: {metrics.psnr(x0, s['gt']):.2f} dB")
    print(f"untrained policy PSNR: {run():.2f} dB")

    dataset = [{"x0": np.real(ss["x0"]).astype(np.float32),
                "gt": ss["gt"].astype(np.float32), **ss["params"]}
               for ss in samples] * 2
    params = tuner.train(dataset, epochs=1, lr=1e-3, log_every=2)
    print(f"trained policy PSNR: {run(params):.2f} dB")


if __name__ == "__main__":
    main()
