"""Task-scale AutoTune training on CSMRI (VERDICT r1 next-round #8).

Trains the RL hyperparameter policy (algo/special/rl.py
``AutoTuneSolver``, direct-backprop episodes) to emit per-pack
(rho, sigma) schedules for PnP-ADMM CSMRI reconstruction, then compares
against the ``log_descent`` hand schedule at the SAME iteration budget
on held-out samples (natural crops the policy never saw + the
Shepp-Logan phantom family of tests/paper/test_csmri_grid.py).
Reference behavior anchor: rl/solver.py:303-347 (policy drives rho/sigma
over packed iterations); the reference trains via tfpnp's MDDPG, here
the episode is end-to-end differentiable so direct backprop is used.

    python scripts/train_autotune_csmri.py --steps 400        (real TPU)
    python scripts/train_autotune_csmri.py --eval-only        (shipped)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.algo.special import AutoTuneSolver
from dprox_tpu.contrib import csmri
from dprox_tpu.utils import metrics

from train_tiny_denoiser import natural_crops

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "autotune_csmri.msgpack")
SIZE = 128
EPISODE_ITERS = 30  # 6 policy steps x 5-iteration packs


def build_tuner():
    x = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    solver = dp.compile(dp.csmri(x, mask, y) + dp.deep_prior(x, "tv",
                                                             sqrt=True),
                        method="admm")
    return AutoTuneSolver(solver, action_pack=5, max_episode_step=6)


def make_samples(n, seed0, extra_textures=False):
    """CSMRI problems over natural grayscale crops x random masks/noise."""
    crops = natural_crops(n, SIZE, 1, seed=seed0,
                          extra_textures=extra_textures)[..., 0]
    rng = np.random.RandomState(seed0)
    out = []
    for i in range(n):
        s = csmri.generate_sample(
            SIZE, num_lines=int(rng.choice([30, 40, 50])),
            sigma=float(rng.choice([0.0, 0.02, 0.05])), seed=seed0 + i,
            gt=crops[i])
        out.append(s)
    return out


def baseline_psnr(sample, max_iter=EPISODE_ITERS):
    x = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    solver = dp.compile(dp.csmri(x, mask, y) + dp.deep_prior(x, "tv",
                                                             sqrt=True),
                        method="admm")
    rhos, sigmas = dp.log_descent(30, 5, max_iter, sigma=0.01)
    out = solver.solve(x0=sample["x0"], rhos=rhos, lams=sigmas,
                       max_iter=max_iter, params=sample["params"],
                       real_output=True)
    return metrics.psnr(np.asarray(out), sample["gt"])


def tuned_psnr(tuner, sample, params=None):
    out = tuner.solve(np.real(sample["x0"]).astype(np.float32),
                      params=params, solve_params=sample["params"])
    return metrics.psnr(np.real(np.asarray(out)), sample["gt"])


def evaluate(tuner, samples, params=None, tag=""):
    gains = []
    for i, s in enumerate(samples):
        bp = baseline_psnr(s)
        tp = tuned_psnr(tuner, s, params)
        gains.append(tp - bp)
        print(f"  {tag}[{i}] log_descent {bp:6.2f}  autotune {tp:6.2f}  "
              f"gain {tp - bp:+5.2f} dB", flush=True)
    print(f"{tag} mean gain: {np.mean(gains):+5.2f} dB "
          f"(min {np.min(gains):+5.2f})", flush=True)
    return float(np.mean(gains))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    tuner = build_tuner()

    # held-out: crops from a disjoint seed + the phantom grid configs
    heldout = make_samples(6, seed0=9000)
    heldout += [csmri.generate_sample(SIZE, num_lines=l, sigma=s)
                for l, s in ((50, 0.0), (40, 0.05))]

    if args.eval_only or os.path.exists(WEIGHTS) and args.steps == 0:
        from flax import serialization

        with open(WEIGHTS, "rb") as f:
            tuner.policy_params = serialization.from_bytes(
                tuner.policy_params, f.read())
        evaluate(tuner, heldout, tag="heldout")
        return

    train = make_samples(args.n_train, seed0=0, extra_textures=True)
    dataset = []
    for ep in range(max(1, args.steps // len(train))):
        order = np.random.RandomState(ep).permutation(len(train))
        for i in order:
            s = train[i]
            dataset.append(dict({"x0": np.real(s["x0"]).astype(np.float32),
                                 "gt": s["gt"].astype(np.float32)[None]},
                                **s["params"]))
    dataset = dataset[:args.steps]

    print(f"training: {len(dataset)} steps over {len(train)} problems",
          flush=True)
    t0 = time.time()
    params = tuner.train(dataset, epochs=1, lr=args.lr, log_every=20)
    print(f"trained in {time.time() - t0:.0f} s", flush=True)

    gain = evaluate(tuner, heldout, params, tag="heldout")

    from flax import serialization

    with open(WEIGHTS, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    print(f"saved {WEIGHTS} ({os.path.getsize(WEIGHTS) // 1024} KB); "
          f"heldout mean gain {gain:+.2f} dB", flush=True)


if __name__ == "__main__":
    main()
