"""Distill the x8 ensemble prior into a single student FFDNet.

Round 2's quality flagship `deep_prior(x, "ensemble_tv", x8=True)` makes
~16 sequential CNN calls + TV per prox (Augment over a 2-net ensemble).
This script trains a single nc=96 residual FFDNet student to match the
DEEP branch of that teacher — Augment(Ensemble([res_ffdnet_color,
tiny_drunet_color], [0.6, 0.4])) — so a `DeepTVDenoiser(student, 0.5)`
prox costs ONE net call + TV while holding the ensemble's quality.
(The TV fusion branch is equivariant to the x8 transforms and linear in
the average, so distilling the deep branch alone and re-fusing with TV
at solve time reproduces the full teacher to first order.)

Teacher targets are precomputed once into an on-device cache (the
teacher is 16 forwards/sample — caching amortizes it over all epochs),
then the student trains on  w_d*MSE(student, teacher) +
w_g*MSE(student, clean)  with jitted lax.scan chunks.

    python scripts/distill_prior.py --steps 30000 --cache-n 8192
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import serialization

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dprox_tpu.models import FFDNet
from dprox_tpu.proxfn.pnp.denoisers import Augment, EnsembleDenoiser
from dprox_tpu.proxfn.pnp.prior import get_denoiser
from train_tiny_denoiser import build_corpus, colored_noise


def build_teacher(channels=3):
    if channels == 1:
        # strongest gray teacher: x8 self-ensemble of the residual gray
        # net (there is no second gray net to ensemble — capacity is
        # corpus-saturated in gray, weights/README finding 6)
        return Augment(get_denoiser("res_ffdnet"))
    ens = EnsembleDenoiser([get_denoiser("res_ffdnet_color"),
                            get_denoiser("tiny_drunet_color")],
                           weights=[0.6, 0.4])
    return Augment(ens)


def make_cache(teacher, corpus, n, size, batch, sigma_lo, sigma_hi, seed):
    """(noisy, sigma, teacher_out, clean) tuples, NHWC float32."""
    n_img = corpus.shape[0]
    corpus_d = jnp.asarray(corpus)

    # corpus_d enters as an ARGUMENT (axon closure-constant hazard —
    # see the held_mse note in train_student)
    @jax.jit
    def gen(key, corpus_d):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        idx = jax.random.randint(k1, (batch,), 0, n_img)
        clean = corpus_d[idx]
        sigma = jax.random.uniform(k2, (batch,), minval=sigma_lo,
                                   maxval=sigma_hi)
        # half white / half spectrally-shaped noise: PnP x-updates feed
        # the prior colored inverse-filter residuals, not white noise
        alpha = jax.random.uniform(k4, (batch,), minval=-1.5, maxval=1.5)
        alpha = jnp.where(jax.random.bernoulli(k5, 0.5, (batch,)),
                          alpha, jnp.zeros_like(alpha))
        nz = colored_noise(k3, clean.shape, alpha)
        noisy = clean + sigma[:, None, None, None] * nz
        # teacher works in NCHW at the wrapper level
        t = teacher.denoise(jnp.transpose(noisy, (0, 3, 1, 2)), sigma)
        return noisy, sigma, jnp.transpose(t, (0, 2, 3, 1)), clean

    outs = {k: [] for k in ("noisy", "sigma", "teacher", "clean")}
    key = jax.random.key(seed + 101)
    t0 = time.time()
    for i in range(n // batch):
        key, sub = jax.random.split(key)
        noisy, sigma, t, clean = gen(sub, corpus_d)
        outs["noisy"].append(np.asarray(noisy, np.float32))
        outs["sigma"].append(np.asarray(sigma, np.float32))
        outs["teacher"].append(np.asarray(t, np.float32))
        outs["clean"].append(np.asarray(clean, np.float32))
        if i % 32 == 0:
            print(f"cache {i * batch}/{n} ({time.time() - t0:.0f}s)",
                  flush=True)
    return {k: np.concatenate(v) for k, v in outs.items()}


def widen_params(params, narrow, nc_old, nb):
    """Function-preserving net2net widening of an FFDNet param pytree.

    `params` is a freshly initialized nc-wide pytree, `narrow` an
    nc_old-wide trained one (nc_old < nc). For every conv the old
    weights land in the leading [.., :cin_old, :cout_old] block; the
    new-INPUT columns feeding OLD output channels are zeroed (so every
    pre-existing feature map is bit-identical at init), while the new
    OUTPUT rows keep their fresh random init (they are consumed through
    zeroed columns downstream, so the network function is exactly the
    narrow student's — but the fresh rows produce nonzero activations,
    so gradients reach the new capacity immediately; a zero/zero pad
    would leave it dead). weights/README finding 21: nc=128 costs the
    same v5e wall-clock as nc=96, so the extra capacity is free.
    """
    wide = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    for i in range(nb):
        kw = wide["params"][f"Conv_{i}"]["Conv_0"]
        kn = narrow["params"][f"Conv_{i}"]["Conv_0"]
        Kw, Kn = kw["kernel"], kn["kernel"]
        ci, co = Kn.shape[2], Kn.shape[3]
        K = Kw
        if Kw.shape[2] > ci:  # zero new-input columns for old outputs
            K = K.at[:, :, ci:, :co].set(0.0)
        K = K.at[:, :, :ci, :co].set(Kn)
        b = kw["bias"].at[:co].set(kn["bias"])
        wide["params"][f"Conv_{i}"]["Conv_0"] = {"kernel": K, "bias": b}
    return wide


def train_student(cache, nc, nb, steps, batch, lr, w_gt, seed, init_path,
                  chunk=100, channels=3, widen_from=None, ckpt_path=None,
                  heldout_n=64):
    model = FFDNet(in_nc=channels, out_nc=channels, nc=nc, nb=nb,
                   residual=True)
    params = model.init(jax.random.key(seed),
                        jnp.zeros((1, 64, 64, channels)), jnp.zeros(()))
    if widen_from and os.path.exists(widen_from):
        # widen a narrower trained student into this width
        nc_old = None
        with open(widen_from, "rb") as f:
            raw = f.read()
        for cand in (96, 64, 32):
            narrow_model = FFDNet(in_nc=channels, out_nc=channels, nc=cand,
                                  nb=nb, residual=True)
            narrow = narrow_model.init(jax.random.key(0),
                                       jnp.zeros((1, 64, 64, channels)),
                                       jnp.zeros(()))
            try:
                narrow = serialization.from_bytes(narrow, raw)
                nc_old = cand
                break
            except Exception:
                continue
        assert nc_old is not None, f"cannot infer width of {widen_from}"
        params = widen_params(params, narrow, nc_old, nb)
        print(f"student widened {nc_old}->{nc} from {widen_from} "
              "(function-preserving)")
    elif init_path and os.path.exists(init_path):
        with open(init_path, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        print(f"student initialized from {init_path}")

    # reserve a heldout tail for best-iterate selection (finding 18:
    # select on a validation objective, never a train-loss EMA)
    n = cache["noisy"].shape[0] - heldout_n
    data = {k: jnp.asarray(v[:n]) for k, v in cache.items()}
    held = {k: jnp.asarray(v[n:]) for k, v in cache.items()}
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.02)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    # `held` MUST be passed as an argument, never closed over: on the
    # axon backend a multi-MB DEVICE-array closure constant inside a
    # large program is lowered CORRUPTED (deterministically wrong
    # results ~= cross-image MSE; the arrays round-trip intact, small
    # programs are fine, and the same arrays as jit ARGUMENTS are
    # exact — benchmarks/closure_constant_probe.py is the minimal
    # repro). This silently broke best-iterate selection on the first
    # width-128 distill run.
    @jax.jit
    def held_mse(p, h):
        den = model.apply(p, h["noisy"], h["sigma"])
        return ((1 - w_gt) * jnp.mean((den - h["teacher"]) ** 2)
                + w_gt * jnp.mean((den - h["clean"]) ** 2))

    def one_step(data, carry, key):
        params, opt_state = carry
        idx = jax.random.randint(key, (batch,), 0, n)
        noisy, sigma = data["noisy"][idx], data["sigma"][idx]
        target = data["teacher"][idx]
        clean = data["clean"][idx]

        def loss_fn(p):
            den = model.apply(p, noisy, sigma)
            return ((1 - w_gt) * jnp.mean((den - target) ** 2)
                    + w_gt * jnp.mean((den - clean) ** 2))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, upd), opt_state), loss

    from functools import partial

    @jax.jit
    def run_chunk(params, opt_state, key, data):
        keys = jax.random.split(key, chunk)
        (params, opt_state), losses = jax.lax.scan(
            partial(one_step, data), (params, opt_state), keys)
        return params, opt_state, jnp.mean(losses)

    key = jax.random.key(seed + 1)
    best = (float(held_mse(params, held)), jax.device_get(params))
    print(f"init heldout loss {best[0]:.6f}", flush=True)
    for i in range(steps // chunk):
        key, sub = jax.random.split(key)
        params, opt_state, loss = run_chunk(params, opt_state, sub, data)
        if i % 5 == 4 or i == steps // chunk - 1:
            hm = float(held_mse(params, held))
            if hm < best[0]:
                best = (hm, jax.device_get(params))
                if ckpt_path:  # periodic atomic checkpoint of the best
                    tmp = ckpt_path + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(serialization.to_bytes(best[1]))
                    os.replace(tmp, ckpt_path)
            if i % 10 == 9 or i == steps // chunk - 1:
                print(f"step {(i + 1) * chunk}/{steps} "
                      f"loss {float(loss):.6f} held {hm:.6f} "
                      f"best {best[0]:.6f}", flush=True)
        elif i % 10 == 0:
            print(f"step {(i + 1) * chunk}/{steps} loss {float(loss):.6f}",
                  flush=True)
    print(f"best heldout loss {best[0]:.6f}")
    return model, best[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--cache-n", type=int, default=8192)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--nc", type=int, default=96)
    ap.add_argument("--nb", type=int, default=10)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--w-gt", type=float, default=0.2)
    ap.add_argument("--sigma-lo", type=float, default=0.01)
    ap.add_argument("--sigma-hi", type=float, default=0.35)
    ap.add_argument("--n-images", type=int, default=2048)
    ap.add_argument("--channels", type=int, default=3, choices=(1, 3))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--widen-from", type=str, default=None,
                    help="trained narrower student to net2net-widen into "
                         "--nc (function-preserving init)")
    args = ap.parse_args()

    if args.channels == 1 and args.nc == 96:
        args.nc = 64  # match the gray teacher's capacity (res_ffdnet_gray)

    corpus = build_corpus("mixed", args.n_images, args.size, args.channels,
                          args.seed)
    teacher = build_teacher(args.channels)
    cache = make_cache(teacher, corpus, args.cache_n, args.size, args.batch,
                       args.sigma_lo, args.sigma_hi, args.seed)
    init_name = ("res_ffdnet_gray.msgpack" if args.channels == 1
                 else "res_ffdnet_color.msgpack")
    init_path = os.path.join(os.path.dirname(__file__), "..", "weights",
                             init_name)
    out_name = ("distilled_ffdnet_gray.msgpack" if args.channels == 1
                else "distilled_ffdnet_color.msgpack")
    out_path = args.out or os.path.join(os.path.dirname(__file__), "..",
                                        "weights", out_name)
    model, params = train_student(cache, args.nc, args.nb, args.steps,
                                  args.batch, args.lr, args.w_gt, args.seed,
                                  init_path, channels=args.channels,
                                  widen_from=args.widen_from,
                                  ckpt_path=out_path + ".ckpt")

    # raw-denoiser sanity at sigma=0.1 vs the teacher on fresh data
    rng = np.random.RandomState(12345)
    clean = jnp.asarray(corpus[:16])
    noisy = clean + 0.1 * jnp.asarray(rng.randn(*clean.shape), jnp.float32)
    s = jnp.full((16,), 0.1)
    den = model.apply(params, noisy, s)
    t = jnp.transpose(teacher.denoise(jnp.transpose(noisy, (0, 3, 1, 2)), s),
                      (0, 2, 3, 1))

    def psnr(a, b):
        return -10 * np.log10(float(jnp.mean((a - b) ** 2)))

    print(f"sigma=0.1: student->clean {psnr(den, clean):.2f} dB, "
          f"teacher->clean {psnr(t, clean):.2f} dB, "
          f"student->teacher {psnr(den, t):.2f} dB")

    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    print(f"saved {out_path} ({os.path.getsize(out_path) // 1024} KB)")


if __name__ == "__main__":
    main()
