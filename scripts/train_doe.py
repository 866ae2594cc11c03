"""End-to-end DOE co-design training at task scale (VERDICT r2 #3).

Trains the diffractive optical element's height map JOINTLY with the
unrolled PnP-ADMM reconstruction schedules by differentiating through
PSF simulation (Fresnel propagation) -> conv_doe measurement -> 10
ADMM iterations with the shipped fusion prior — the reference's
flagship SIGGRAPH'23 experiment (examples/.../e2e_optics_dprox.py:
113-229, golden tests/paper/test_optics.py:97-105) at an
offline-feasible scale (128^2 natural crops, in-repo prior).

Ships weights/doe_codesign.msgpack = {height_map_sqrt, rhos, sigmas};
the pinned golden (tests/test_optics.py) compares co-designed vs
fixed-Fresnel-lens reconstruction on held-out crops.

    python scripts/train_doe.py --steps 400     (real TPU)
    python scripts/train_doe.py --eval-only
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization

import dprox_tpu as dp
from dprox_tpu.contrib.optic import (DOEModelConfig,
                                     build_baseline_height_map_sqrt,
                                     build_doe_model, img_psf_conv)
from dprox_tpu.utils import metrics

from train_tiny_denoiser import natural_crops

# Shipped artifact (read for --resume/--eval-only). Training WRITES to a
# scratch path by default so a run can never silently mutate the shipped
# weights (VERDICT r3 weak #1); pass --out weights/doe_codesign.msgpack
# explicitly to ship.
WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "doe_codesign.msgpack")
SCRATCH = "/tmp/doe_codesign.msgpack"
PATCH = 128
MAX_ITER = 10
SIGMA = 7.65 / 255
PRIOR = "res_ffdnet_color_tv"
# Downscaling the reference optic (748px/2e-6m) to 128px raises the
# sample interval ~6x; at the reference's 15mm sensor distance the
# Fresnel-lens phase gradient k*r_max*dx/d then exceeds pi per sample
# (aliased -> unfocused PSF, ~2% energy near the peak). 80mm keeps the
# phase Nyquist-sampled: the baseline lens focuses 98% of its energy
# within 5px, so the co-design is compared against a REAL lens.
SENSOR_DISTANCE = 80e-3


def build(patch=PATCH, prior=PRIOR):
    config = DOEModelConfig(
        patch_size=patch, wave_resolution=(patch * 2, patch * 2),
        sample_interval=2e-6 * 1496 / (patch * 2),
        sensor_distance=SENSOR_DISTANCE)
    model = build_doe_model(config)
    x = dp.Variable()
    psf_ph = dp.Placeholder("psf")
    y_ph = dp.Placeholder("y")
    data_term = dp.sum_squares(dp.conv_doe(x, psf_ph, circular=True), b=y_ph)
    solver = dp.compile(data_term + dp.deep_prior(x, prior), method="admm")
    return config, model, solver


def hopper_crops(size=PATCH, n=4):
    """Held-out eval crops from grace_hopper.jpg (never trained on)."""
    import matplotlib
    from PIL import Image

    path = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                        "sample_data", "grace_hopper.jpg")
    img = np.asarray(Image.open(path), np.float32) / 255.0
    h, w = img.shape[:2]
    rng = np.random.RandomState(42)
    crops = []
    for _ in range(n):
        top, left = rng.randint(h - size + 1), rng.randint(w - size + 1)
        crops.append(img[top:top + size, left:left + size]
                     .transpose(2, 0, 1))
    return np.stack(crops)


def hand_schedule(n=MAX_ITER):
    """Best hand schedule found for this optic family (grid search over
    geomspace rho descents x log_descent sigmas; 20.95 dB on face with
    the TV prior vs 6.9 dB with the imaging default (49,7.65) DPIR
    schedule, whose rho~1e-5 turns the x-update into an unregularized
    pseudo-inverse of the |H|~0.33-scaled OTF)."""
    rhos = jnp.geomspace(0.3, 0.03, n)
    _, sigmas = dp.log_descent(80, 30, n)
    return rhos, sigmas


def make_reconstruct(model, solver):
    """One jitted measure-and-reconstruct: the whole optic (complex field
    propagation) stays in-graph — eager complex ops are unimplemented on
    the axon TPU backend. Both the co-designed DOE and the Fresnel-lens
    baseline enter through a real height_map_sqrt."""

    @jax.jit
    def recon(height_map_sqrt, gt, rhos, sigmas, key):
        psf = model.get_psf({"height_map_sqrt": height_map_sqrt})
        inp = img_psf_conv(gt, psf, circular=True)
        inp = inp + SIGMA * jax.random.normal(key, inp.shape)
        out = solver.solve(x0=inp, rhos=rhos, lams=sigmas,
                           max_iter=MAX_ITER, params={"psf": psf, "y": inp})
        return out

    return recon


def evaluate(model, solver, params, crops, tag="", recon=None):
    """Co-designed vs fixed Fresnel lens, same solver family."""
    rhos0, sigmas0 = hand_schedule()
    fresnel_hms = jnp.asarray(build_baseline_height_map_sqrt(model))
    if recon is None:
        recon = make_reconstruct(model, solver)
    gains = []
    for i, gt in enumerate(crops):
        gt = jnp.asarray(gt)[None]
        out_c = recon(params["height_map_sqrt"], gt,
                      params["rhos"], params["sigmas"],
                      jax.random.key(100 + i))
        out_f = recon(fresnel_hms, gt, rhos0, sigmas0,
                      jax.random.key(100 + i))
        pc = metrics.psnr(np.clip(np.asarray(out_c), 0, 1), np.asarray(gt))
        pf = metrics.psnr(np.clip(np.asarray(out_f), 0, 1), np.asarray(gt))
        gains.append(pc - pf)
        print(f"  {tag}[{i}] fresnel {pf:6.2f}  co-designed {pc:6.2f}  "
              f"gain {pc - pf:+5.2f} dB", flush=True)
    print(f"{tag} mean gain {np.mean(gains):+5.2f} dB "
          f"(min {np.min(gains):+5.2f})", flush=True)
    return float(np.mean(gains))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--lr-height", type=float, default=5e-4)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="warm-start from the shipped weights")
    ap.add_argument("--resume-from", type=str, default=None,
                    help="warm-start from an arbitrary checkpoint path")
    ap.add_argument("--prior", type=str, default=PRIOR)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=SCRATCH,
                    help="where to save trained weights (scratch by "
                         "default; pass the weights/ path to ship)")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="run the held-out eval every N steps (0 = only "
                         "at the end)")
    ap.add_argument("--warmup", type=int, default=50)
    ap.add_argument("--select", choices=("ema", "val"), default="val",
                    help="model selection: best train-loss EMA, or best "
                         "fixed-key loss on held-out-position val crops "
                         "(the r4 resume showed EMA selecting params that "
                         "were ~2 dB worse on the true held-out eval)")
    args = ap.parse_args()

    config, model, solver = build(prior=args.prior)
    rhos0, sigmas0 = hand_schedule()
    params = {"height_map_sqrt": model.init_params()["height_map_sqrt"],
              "rhos": rhos0, "sigmas": sigmas0}
    crops_eval = hopper_crops()

    if args.eval_only:
        with open(WEIGHTS, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        evaluate(model, solver, params, crops_eval, tag="heldout")
        return

    data = jnp.asarray(natural_crops(args.n_train, PATCH, 3, seed=args.seed)
                       .transpose(0, 3, 1, 2))

    # Schedules live in LOG space: the first run (flat parameterization,
    # sched lr 5e-3) climbed 18.4 -> 26.6 dB by step 100, then a sigma
    # crossed toward zero/negative and the whole run blew up to ~12 dB
    # with no recovery. exp() keeps rho/sigma positive by construction
    # and makes the step size proportional (a log-space move is a
    # relative move).
    if args.resume or args.resume_from:
        src = args.resume_from or WEIGHTS
        with open(src, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        print(f"resumed from {src}", flush=True)
    tparams = {"height_map_sqrt": jnp.asarray(params["height_map_sqrt"]),
               "log_rhos": jnp.log(jnp.asarray(params["rhos"])),
               "log_sigmas": jnp.log(jnp.asarray(params["sigmas"]))}

    def step_fn(tp, key, batch):
        psf = model.get_psf({"height_map_sqrt": tp["height_map_sqrt"]})
        inp = img_psf_conv(batch, psf, circular=True)
        inp = inp + SIGMA * jax.random.normal(key, inp.shape)
        out = solver.solve(x0=inp, rhos=jnp.exp(tp["log_rhos"]),
                           lams=jnp.exp(tp["log_sigmas"]),
                           max_iter=MAX_ITER,
                           params={"psf": psf, "y": inp})
        return jnp.mean((out - batch) ** 2)

    # per-group lrs: the height map's phase wraps every ~1um, so large
    # steps destroy focus (2 smoke steps at a flat 5e-3 cost -6 dB);
    # the schedules tolerate much larger relative moves. Cosine decay
    # anneals both groups to ~0 by the end of the run. Linear warmup
    # tames fresh-Adam's bias-correction kick on --resume (the r4 cold
    # restart knocked the optic out of its basin: loss 0.0037 -> 0.045
    # by step 20 and the run never recovered the shipped quality).
    def _sched(peak):
        return optax.warmup_cosine_decay_schedule(
            0.0, peak, args.warmup, args.steps, end_value=0.02 * peak)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {"height": optax.adam(_sched(args.lr_height)),
             "sched": optax.adam(_sched(args.lr))},
            {"height_map_sqrt": "height", "log_rhos": "sched",
             "log_sigmas": "sched"}))
    opt_state = tx.init(tparams)

    @jax.jit
    def update(tp, opt_state, key, batch):
        loss, g = jax.value_and_grad(step_fn)(tp, key, batch)
        upd, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(tp, upd), opt_state, loss

    key = jax.random.key(args.seed + 1)
    rng = np.random.RandomState(args.seed + 3)
    t0 = time.time()
    recon = make_reconstruct(model, solver)

    def to_eval(tp):
        return {"height_map_sqrt": tp["height_map_sqrt"],
                "rhos": jnp.exp(tp["log_rhos"]),
                "sigmas": jnp.exp(tp["log_sigmas"])}

    # validation crops at held-out POSITIONS (same sklearn source photos,
    # disjoint seed; hopper stays a pure test set) with a FIXED noise key
    # — the selection signal generalizes where the noisy single-batch
    # train-loss EMA did not
    val = jnp.asarray(natural_crops(16, PATCH, 3, seed=args.seed + 555)
                      .transpose(0, 3, 1, 2))
    val_loss = jax.jit(lambda tp: step_fn(tp, jax.random.key(777), val))

    # best-iterate tracking: update() returns the loss at its INPUT
    # params, so the candidate to keep is the PRE-update pytree. EMA of
    # the loss smooths single-batch noise.
    best = (np.inf, tparams)
    ema = None
    best_val = (float(val_loss(tparams)), tparams)
    print(f"initial val loss {best_val[0]:.6f}", flush=True)
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        idx = rng.randint(0, args.n_train, args.batch)
        prev = tparams
        tparams, opt_state, loss = update(tparams, opt_state, sub,
                                          data[jnp.asarray(idx)])
        loss = float(loss)
        ema = loss if ema is None else 0.8 * ema + 0.2 * loss
        if ema < best[0]:
            best = (ema, prev)
        if (i + 1) % 25 == 0:
            vl = float(val_loss(tparams))
            if vl < best_val[0]:
                best_val = (vl, tparams)
        if i % 20 == 0:
            print(f"step {i}/{args.steps} loss {loss:.6f} "
                  f"psnr {-10 * np.log10(max(loss, 1e-12)):.2f} dB "
                  f"best-ema {best[0]:.6f} best-val {best_val[0]:.6f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if args.eval_every and i and i % args.eval_every == 0:
            sel = best_val[1] if args.select == "val" else best[1]
            evaluate(model, solver, to_eval(sel), crops_eval,
                     tag=f"step{i}", recon=recon)

    if args.select == "val":
        best = best_val

    params = to_eval(best[1])
    evaluate(model, solver, params, crops_eval, tag="heldout", recon=recon)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(
            {k: jnp.asarray(v) for k, v in params.items()})))
    print(f"saved {args.out} ({os.path.getsize(args.out) // 1024} KB)")


if __name__ == "__main__":
    main()
