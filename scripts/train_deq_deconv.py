"""Task-scale COLOR DEQ on deconvolution (VERDICT r3 next #4).

Mirrors the gray CSMRI DEQ (scripts/train_deq_csmri.py): one ADMM
iteration — FFT-diagonal conv data term + the distilled color prior —
becomes the fixed-point map; the prior's weights are finetuned THROUGH
the equilibrium (implicit adjoint) together with learned global
(rho, lam) multipliers. Reference family: DEQ specialization,
/root/reference/dprox/algo/specialization/deq/solver.py +
tests/paper/test_csmri.py:197-222.

Problems: 128^2 color natural crops, Gaussian PSFs at several widths
(entering through a conv_doe placeholder so ONE compiled solver covers
all of them), measurement noise in {0, 0.01, 0.02}. Baseline at the
SAME 24-iteration budget: PnP-ADMM with the flagship distilled_color_tv
prior and its tuned noise-adapted log-descent schedule.

    python scripts/train_deq_deconv.py --steps 600     (real TPU)
    python scripts/train_deq_deconv.py --eval-only

Writes scratch by default; --out weights/deq_deconv.msgpack to ship.
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
from dprox_tpu.algo.special import DEQSolver
from dprox_tpu.proxfn.pnp.prior import get_denoiser
from dprox_tpu.utils import imaging, metrics

from train_tiny_denoiser import natural_crops

SCRATCH = "/tmp/deq_deconv.msgpack"
WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "deq_deconv.msgpack")
SIZE = 128
BUDGET = 24
PSF_SIGMAS = (3.0, 5.0, 7.0)
# NOISY deconv only: on noiseless cells a fixed-(rho,lam) equilibrium
# saturates ~31 dB at ANY base within the 24-iteration budget (measured
# sweep: rho 5e-4..0.1 x lam 1e-3..0.12) while annealed PnP reaches 37 —
# strong-to-weak annealing converges fast where the tiny-rho fixed
# point cannot be reached in-budget. The DEQ's domain (like the gray
# CSMRI one) is the noisy regime, where it already ties PnP untrained.
NOISES = (0.01, 0.02, 0.03)


def deq_base(sn):
    """Noise-conditioned base (rho, lam); global learned multipliers
    ride on top (one pair cannot span noise levels)."""
    return 0.05 + 5.0 * sn, 0.1 + 2.0 * sn


def make_psf(sig):
    """(conv_doe layout [1, 3, k, k], original HW1)"""
    p = imaging.point_spread_function(15, sig)  # [k, k, 1]
    return np.tile(np.transpose(p, (2, 0, 1))[None], (1, 3, 1, 1)), p


def build_deq(f_thres=BUDGET, b_thres=16):
    den = get_denoiser("distilled_color")
    x = dp.Variable()
    psf_ph = dp.Placeholder("psf")
    y_ph = dp.Placeholder("y")
    data = dp.sum_squares(dp.conv_doe(x, psf_ph, circular=True), b=y_ph)
    reg = dp.deep_prior(x, den, param_key="deq_prior")  # sigma = lam direct
    solver = dp.compile(data + reg, method="admm")
    deq = DEQSolver(solver, learned_params=True, f_thres=f_thres,
                    b_thres=b_thres)
    return deq, den


def make_problems(crops, seed0):
    rng = np.random.RandomState(seed0)
    out = []
    for i, gt in enumerate(crops):
        sig = float(rng.choice(PSF_SIGMAS))
        sn = float(rng.choice(NOISES))
        psf, psf_hw1 = make_psf(sig)
        gt4 = gt[None]  # [1, 3, H, W]
        y = np.asarray(imaging.blurring(gt4, psf_hw1))
        y = y + sn * rng.randn(*y.shape).astype(np.float32)
        out.append({"gt": gt4, "psf": psf, "psf_hw1": psf_hw1, "y": y,
                    "sigma_n": sn, "psf_sigma": sig})
    return out


def pnp_psnr(prob, max_iter=BUDGET, prior="distilled_color_tv"):
    """Flagship PnP baseline at its tuned schedule, noise-adapted like
    the CSMRI grid rule (end the sigma descent above the noise floor)."""
    x = dp.Variable()
    data = dp.sum_squares(dp.conv(x, prob["psf_hw1"]) - jnp.asarray(prob["y"]))
    solver = dp.compile(data + dp.deep_prior(x, prior), method="admm")
    sn = prob["sigma_n"]
    # DPIR rule with the MEASURED-best rho scaling: the stock
    # lam=0.23 collapses at these noise levels (10-17 dB); the sweep
    # over lam multipliers {1,3,10,30,100} found 10-30 best at
    # sn in {0.01, 0.02} (25.4 / 22.4 dB) — this baseline takes the
    # BEST of both so the DEQ comparison is honest
    best = -1.0
    for mult in (10, 30):
        rhos, sigmas = dp.log_descent(80, 25 + 600 * sn, max_iter,
                                      sigma=max(sn, 0.001),
                                      lam=0.23 * mult)
        out = solver.solve(x0=jnp.asarray(prob["y"]), rhos=rhos,
                           lams=sigmas, max_iter=max_iter)
        best = max(best, metrics.psnr(np.clip(np.asarray(out), 0, 1),
                                      prob["gt"]))
    return best


def deq_psnr(deq, prob, params):
    p = dict(params)
    p.update({"psf": jnp.asarray(prob["psf"]), "y": jnp.asarray(prob["y"])})
    rho, lam = deq_base(prob["sigma_n"])
    out = deq.solve(x0=jnp.asarray(prob["y"]), rhos=rho, lams=lam,
                    params=p, real_output=True)
    return metrics.psnr(np.clip(np.asarray(out), 0, 1), prob["gt"])


def heldout_problems():
    """hopper crops (never trained on), fixed configs spanning the grid."""
    import matplotlib
    from PIL import Image

    path = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                        "sample_data", "grace_hopper.jpg")
    img = np.asarray(Image.open(path), np.float32) / 255.0
    rng = np.random.RandomState(42)
    h, w = img.shape[:2]
    crops = []
    for _ in range(4):
        top, left = rng.randint(h - SIZE + 1), rng.randint(w - SIZE + 1)
        crops.append(img[top:top + SIZE, left:left + SIZE].transpose(2, 0, 1))
    probs = []
    for i, (sig, sn) in enumerate([(5.0, 0.01), (5.0, 0.02), (3.0, 0.01),
                                   (7.0, 0.03)]):
        gt4 = crops[i][None]
        psf, psf_hw1 = make_psf(sig)
        y = np.asarray(imaging.blurring(gt4, psf_hw1))
        y = y + sn * np.random.RandomState(77 + i).randn(*y.shape).astype(np.float32)
        probs.append({"gt": gt4, "psf": psf, "psf_hw1": psf_hw1, "y": y,
                      "sigma_n": sn, "psf_sigma": sig})
    return probs


def noiseless_problems():
    """Same hopper crops, noiseless configs spanning blur widths."""
    probs = heldout_problems()
    out = []
    for i, (p, sig) in enumerate(zip(probs, (3.0, 5.0, 7.0))):
        psf, psf_hw1 = make_psf(sig)
        y = np.asarray(imaging.blurring(p["gt"], psf_hw1))
        out.append({"gt": p["gt"], "psf": psf, "psf_hw1": psf_hw1,
                    "y": y, "sigma_n": 0.0, "psf_sigma": sig})
    return out


def noiseless_eval(params):
    """VERDICT r4 #7: the fixed-(rho,lam) equilibrium saturates ~31 dB
    on noiseless deconv where annealed PnP reaches ~37 (measured r4).
    The lever: L successive equilibria over a strong-to-weak (rho,
    sigma) schedule (DEQSolver(anneal=L)), warm-starting each level
    from the previous fixed point, at the SAME total budget
    L * f_thres = 24."""
    probs = noiseless_problems()
    den = get_denoiser("distilled_color")  # rebuilt per config below

    def build(anneal, f_thres):
        x = dp.Variable()
        psf_ph = dp.Placeholder("psf")
        y_ph = dp.Placeholder("y")
        data = dp.sum_squares(dp.conv_doe(x, psf_ph, circular=True), b=y_ph)
        reg = dp.deep_prior(x, den, param_key="deq_prior")
        solver = dp.compile(data + reg, method="admm")
        return DEQSolver(solver, learned_params=True, f_thres=f_thres,
                         b_thres=16, anneal=anneal)

    single = build(1, BUDGET)
    configs = [
        ("dpir6x4", 6, 4, lambda: dp.log_descent(80, 5, 6, sigma=0.001,
                                                 lam=0.23)),
        ("dpir6x4_m10", 6, 4, lambda: dp.log_descent(80, 5, 6, sigma=0.001,
                                                     lam=0.23 * 10)),
        ("dpir12x2", 12, 2, lambda: dp.log_descent(80, 5, 12, sigma=0.001,
                                                   lam=0.23)),
        ("geom6x4", 6, 4, lambda: (np.geomspace(0.02, 0.3, 6),
                                   np.geomspace(0.3, 0.02, 6))),
    ]
    anneal_solvers = {tag: (build(L, fth), sched)
                      for tag, L, fth, sched in configs}

    for i, s in enumerate(probs):
        pnp = pnp_psnr(s)
        rho0, lam0 = deq_base(0.0)
        p = dict(params)
        p.update({"psf": jnp.asarray(s["psf"]), "y": jnp.asarray(s["y"])})
        out = single.solve(x0=jnp.asarray(s["y"]), rhos=rho0, lams=lam0,
                           params=p, real_output=True)
        row = {"pnp_annealed": round(float(metrics.psnr(
            np.clip(np.asarray(out), 0, 1), s["gt"])), 2)}
        row = {"pnp": round(pnp, 2), "deq_single": row["pnp_annealed"]}
        for tag, (solver_a, sched) in anneal_solvers.items():
            rhos, sigmas = sched()
            out = solver_a.solve(x0=jnp.asarray(s["y"]),
                                 rhos=np.asarray(rhos, np.float32),
                                 lams=np.asarray(sigmas, np.float32),
                                 params=p, real_output=True)
            row[tag] = round(float(metrics.psnr(
                np.clip(np.asarray(out), 0, 1), s["gt"])), 2)
        print(f"  noiseless[{i}] (psf {s['psf_sigma']}) {row}", flush=True)


def evaluate(deq, params, probs, tag=""):
    gains = []
    for i, s in enumerate(probs):
        bp = pnp_psnr(s)
        tp = deq_psnr(deq, s, params)
        gains.append(tp - bp)
        print(f"  {tag}[{i}] (psf {s['psf_sigma']}, sn {s['sigma_n']}) "
              f"pnp {bp:6.2f}  deq {tp:6.2f}  gain {tp - bp:+5.2f} dB",
              flush=True)
    print(f"{tag} mean gain {np.mean(gains):+5.2f} dB "
          f"(min {np.min(gains):+5.2f})", flush=True)
    return float(np.mean(gains))


def main():
    global SIZE
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--lr-mult", type=float, default=2e-3)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--noiseless-eval", action="store_true",
                    help="annealed-DEQ study on the NOISELESS regime "
                         "(VERDICT r4 #7): successive equilibria over a "
                         "strong-to-weak schedule vs single-eq DEQ vs "
                         "annealed PnP at the same 24-it budget")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--out", type=str, default=SCRATCH)
    args = ap.parse_args()
    if args.size:
        SIZE = args.size

    deq, den = build_deq()
    params = deq.init_params()
    params["deq_prior"] = den.params
    heldout = heldout_problems()

    if args.eval_only:
        with open(WEIGHTS, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        evaluate(deq, params, heldout, tag="heldout")
        return

    if args.noiseless_eval:
        with open(WEIGHTS, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        noiseless_eval(params)
        return

    crops = natural_crops(args.n_train, SIZE, 3, seed=args.seed)
    train = make_problems(crops.transpose(0, 3, 1, 2), args.seed)

    label = {"deq_prior": "slow", "deq_r": "fast", "deq_l": "fast"}
    tx = optax.multi_transform(
        {"slow": optax.adam(args.lr), "fast": optax.adam(args.lr_mult)},
        {k: label[k] for k in params})
    opt_state = tx.init(params)

    from functools import partial

    # rho/lam static: defaults() needs concrete schedule scalars; only
    # len(NOISES) distinct pairs exist, so at most 3 compiled variants
    @partial(jax.jit, static_argnums=(5, 6))
    def update(params, opt_state, psf, y, gt, rho, lam):
        def loss_fn(p):
            pp = dict(p)
            pp.update({"psf": psf, "y": y})
            out = deq.solve(x0=y, rhos=rho, lams=lam, params=pp,
                            jit=False, real_output=True)
            return jnp.mean((out - gt) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        g = {k: g[k] for k in ("deq_prior", "deq_r", "deq_l")}
        upd, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    rng = np.random.RandomState(args.seed + 7)
    t0 = time.time()
    for step in range(args.steps):
        s = train[rng.randint(len(train))]
        rho, lam = deq_base(s["sigma_n"])
        params, opt_state, loss = update(
            params, opt_state, jnp.asarray(s["psf"]), jnp.asarray(s["y"]),
            jnp.asarray(s["gt"]), round(rho, 6), round(lam, 6))
        if step % 25 == 0:
            print(f"step {step}/{args.steps} loss {float(loss):.5f} "
                  f"r={float(params['deq_r']):.3f} "
                  f"l={float(params['deq_l']):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    evaluate(deq, params, heldout, tag="heldout")
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    print(f"saved {args.out} ({os.path.getsize(args.out) // 1024} KB)")


if __name__ == "__main__":
    main()
