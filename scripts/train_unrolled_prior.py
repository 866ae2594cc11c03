"""Bi-level training of a deconvolution prior through the unrolled solver.

The shipped tiny FFDNet priors are trained as plain Gaussian denoisers
(scripts/train_tiny_denoiser.py); inside PnP-ADMM they then face inverse
-filter ringing they never saw. This script finetunes the denoiser
*through the solver*: each training step builds a random deconvolution
problem (random crop, random Gaussian PSF, sensor noise), runs 10
unrolled ADMM iterations with the denoiser as the prior prox, and
backpropagates the reconstruction MSE into BOTH the denoiser weights and
the per-iteration (rho, sigma) schedules — the specialization pattern of
reference examples/papers/deltaprox_siggraph_2023 (unroll) expressed as
one jitted JAX graph.

Usage:
    python scripts/train_unrolled_prior.py \
        --init weights/cand_mixed_nc32.msgpack --steps 3000

Outputs <out>.msgpack (denoiser params) and <out>.schedule.npz
(trained rhos/sigmas).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import serialization

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dprox_tpu as dp
from dprox_tpu.proxfn.pnp.denoisers import FFDNetColorDenoiser
from train_tiny_denoiser import build_corpus


def gaussian_psf_pool(n: int, size: int = 15, sig_lo: float = 2.0,
                      sig_hi: float = 7.0, seed: int = 0) -> np.ndarray:
    from dprox_tpu.utils.imaging import fspecial_gaussian

    rng = np.random.RandomState(seed)
    return np.stack([
        fspecial_gaussian(size, sig_lo + (sig_hi - sig_lo) * rng.rand())
        for _ in range(n)
    ]).astype(np.float32)


def train(init: str, steps: int = 3000, batch: int = 8, size: int = 128,
          n_images: int = 512, max_iter: int = 10, lr: float = 2e-4,
          sched_lr: float = 1e-2, noise_max: float = 0.02, seed: int = 0,
          out: str | None = None, corpus: str = "mixed"):
    den = FFDNetColorDenoiser(ckpt_path=init, nc=32, nb=8)

    x = dp.Variable()
    y = dp.Placeholder("y")
    psf_ph = dp.Placeholder("psf")
    data_term = dp.sum_squares(dp.conv_doe(x, psf_ph, circular=True), b=y)
    reg_term = dp.deep_prior(x, denoiser=den, sqrt=True, param_key="den")
    solver = dp.compile([data_term, reg_term], method="admm")

    rhos0, sigmas0 = dp.log_descent(60, 30, max_iter)  # sigmas0 = sigma^2
    params = {
        "den": den.params,
        "log_rhos": jnp.log(rhos0),
        "log_sigmas": 0.5 * jnp.log(sigmas0),
    }

    data = jnp.asarray(build_corpus(corpus, n_images, size, 3, seed))
    data = jnp.transpose(data, (0, 3, 1, 2))  # NCHW
    psfs = jnp.asarray(gaussian_psf_pool(64, seed=seed))

    def blur(gt, psf):
        from dprox_tpu.utils.fft import psf2otf_traced

        otf = psf2otf_traced(psf, gt.shape[-2:], torch_compat_shift=False)
        return jnp.real(jnp.fft.ifft2(otf * jnp.fft.fft2(gt)))

    def solve(p, gt, psf, key):
        b = blur(gt, psf)
        b = b + jax.random.uniform(key, (), maxval=noise_max) * \
            jax.random.normal(jax.random.fold_in(key, 1), b.shape)
        out = solver.solve(
            x0=b, rhos=jnp.exp(p["log_rhos"]),
            lams=jnp.exp(2.0 * p["log_sigmas"]), max_iter=max_iter,
            params={"psf": psf, "y": b, "den": p["den"]})
        return out, b

    def loss_fn(p, gt, psf, key):
        out, _ = solve(p, gt, psf, key)
        return jnp.mean((out - gt) ** 2)

    tx = optax.multi_transform(
        {"den": optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.05)),
         "sched": optax.adam(sched_lr)},
        {"den": "den", "log_rhos": "sched", "log_sigmas": "sched"})
    opt_state = tx.init(params)

    def one_step(carry, inp):
        p, o = carry
        idx, pidx, key = inp
        gt = data[idx]
        psf = psfs[pidx]
        loss, g = jax.value_and_grad(loss_fn)(p, gt, psf, key)
        upd, o = tx.update(g, o, p)
        p = optax.apply_updates(p, upd)
        return (p, o), loss

    chunk = 25

    @jax.jit
    def run_chunk(p, o, key):
        ks = jax.random.split(key, chunk)
        idx = jax.random.randint(ks[0], (chunk, batch), 0, data.shape[0])
        pidx = jax.random.randint(ks[1], (chunk,), 0, psfs.shape[0])
        (p, o), losses = jax.lax.scan(one_step, (p, o), (idx, pidx, ks))
        return p, o, jnp.mean(losses)

    key = jax.random.key(seed + 11)
    for i in range(steps // chunk):
        key, sub = jax.random.split(key)
        params, opt_state, loss = run_chunk(params, opt_state, sub)
        if i % 4 == 0:
            print(f"step {(i + 1) * chunk}/{steps} loss {float(loss):.6f} "
                  f"psnr {-10 * np.log10(max(float(loss), 1e-12)):.2f} dB",
                  flush=True)

    out = out or os.path.join(os.path.dirname(__file__), "..", "weights",
                              "unrolled_ffdnet_color")
    with open(out + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params["den"])))
    np.savez(out + ".schedule.npz",
             rhos=np.exp(np.asarray(params["log_rhos"])),
             sigmas=np.exp(2.0 * np.asarray(params["log_sigmas"])))
    print(f"saved {out}.msgpack + schedule", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--init", type=str,
                    default="weights/tiny_ffdnet_color.msgpack")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-iter", type=int, default=10)
    ap.add_argument("--corpus", type=str, default="mixed")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    train(args.init, steps=args.steps, batch=args.batch,
          max_iter=args.max_iter, corpus=args.corpus, out=args.out)
