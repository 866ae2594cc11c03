"""Task-scale MODEL-FREE DDPG training of the CSMRI tuning policy
(VERDICT r3 next #3).

The reference's RL specialization trains its policy with tfpnp's
model-free MDDPG (/root/reference/dprox/algo/specialization/rl/
solver.py:349-395). This repo's ``AutoTuneSolver.train_ddpg``
(algo/special/rl.py: replay buffer, target nets, Polyak averaging) had
only ever run a 1-epoch/batch-4 smoke test; this script trains it at
the same task scale as the shipped backprop policy
(scripts/train_autotune_csmri.py) and reports BOTH comparisons:

  * DDPG policy vs the log_descent hand schedule (same 30-it budget);
  * DDPG vs the shipped backprop-through-episodes policy — the honest
    model-free vs differentiable-env gap.

    python scripts/train_ddpg_csmri.py --epochs 12      (real TPU)
    python scripts/train_ddpg_csmri.py --eval-only

Writes scratch by default; --out weights/ddpg_csmri.msgpack to ship.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
from flax import serialization

from train_autotune_csmri import (WEIGHTS as BACKPROP_WEIGHTS, build_tuner,
                                  evaluate, make_samples, tuned_psnr)
from dprox_tpu.contrib import csmri

SCRATCH = "/tmp/ddpg_csmri.msgpack"
WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "ddpg_csmri.msgpack")
SIZE = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--actor-lr", type=float, default=1e-4)
    ap.add_argument("--critic-lr", type=float, default=3e-4)
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--updates-per-step", type=int, default=3)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=SCRATCH)
    args = ap.parse_args()

    tuner = build_tuner()
    heldout = make_samples(6, seed0=9000)
    heldout += [csmri.generate_sample(SIZE, num_lines=l, sigma=s)
                for l, s in ((50, 0.0), (40, 0.05))]

    if args.eval_only:
        with open(WEIGHTS, "rb") as f:
            tuner.policy_params = serialization.from_bytes(
                tuner.policy_params, f.read())
        evaluate(tuner, heldout, tag="heldout(ddpg)")
        return

    train = make_samples(args.n_train, seed0=0, extra_textures=True)
    dataset = [dict({"x0": np.real(s["x0"]).astype(np.float32),
                     "gt": s["gt"].astype(np.float32)[None]}, **s["params"])
               for s in train]

    t0 = time.time()
    params = tuner.train_ddpg(
        dataset, epochs=args.epochs, actor_lr=args.actor_lr,
        critic_lr=args.critic_lr, noise_scale=args.noise,
        batch_size=args.batch_size, updates_per_step=args.updates_per_step,
        log_every=1, seed=args.seed)
    print(f"ddpg trained in {time.time() - t0:.0f} s", flush=True)

    gain = evaluate(tuner, heldout, params, tag="heldout(ddpg)")

    # the honest model-free vs differentiable-env comparison: same
    # heldout set through the shipped backprop-trained policy
    if os.path.exists(BACKPROP_WEIGHTS):
        bp_tuner = build_tuner()
        with open(BACKPROP_WEIGHTS, "rb") as f:
            bp_params = serialization.from_bytes(bp_tuner.policy_params,
                                                 f.read())
        diffs = []
        for i, s in enumerate(heldout):
            d = tuned_psnr(tuner, s, params) - tuned_psnr(bp_tuner, s,
                                                          bp_params)
            diffs.append(d)
            print(f"  ddpg-vs-backprop[{i}] {d:+5.2f} dB", flush=True)
        print(f"ddpg - backprop mean {np.mean(diffs):+5.2f} dB "
              f"(min {np.min(diffs):+5.2f})", flush=True)

    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    print(f"saved {args.out} ({os.path.getsize(args.out) // 1024} KB); "
          f"heldout mean gain vs log_descent {gain:+.2f} dB", flush=True)


if __name__ == "__main__":
    main()
