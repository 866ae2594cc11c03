"""Train the compact hyperspectral GRUNet prior ("tiny_grunet").

The reference's HSI pillar is PnP with the dphsir-pretrained GRUNet /
QRNN3D weights (reference examples/papers/dphsir_neurcomputing_2022/
hsi_deblur.py:44, wrapper.py:148-221) — 54-55 dB mPSNR on real cubes.
Those weights are egress-blocked here, so this script trains the SAME
flax GRUnet architecture (models/qrnn.py) in-repo on synthetic
hyperspectral cubes built from two generative families:

  * spectralized natural crops: RGB photos (sklearn china/flower — the
    held-out eval image grace_hopper is NEVER used) pushed through a
    random smooth spectral response w[b, c] plus band-smooth gain, so
    spatial statistics are photographic and the band axis is smooth;
  * linear mixing model: k random smooth endmember spectra x spatially
    smooth abundance maps (the physical HSI image model), modulated by
    a natural grayscale texture for spatial detail.

Noise: half iid white sigma ~ U(0, max), half NON-iid per-band sigmas
(band-smooth random envelope) with the true per-band map fed to the
noise-map channel — the dphsir training condition.

    python scripts/train_hsi_prior.py --steps 6000        (real TPU)
    python scripts/train_hsi_prior.py --eval-only

Writes to a scratch path by default; pass --out weights/tiny_grunet
.msgpack to ship.
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

from dprox_tpu.models.qrnn import GRUnet

from train_tiny_denoiser import natural_crops

SCRATCH = "/tmp/tiny_grunet.msgpack"
WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "tiny_grunet.msgpack")


def _smooth_spectra(rng, n, bands, floor=0.05):
    """n random nonnegative band-smooth curves, peak-normalized."""
    t = np.linspace(0, 1, bands, dtype=np.float32)
    out = np.zeros((n, bands), np.float32)
    for i in range(n):
        s = np.full(bands, floor + rng.rand() * 0.3, np.float32)
        for _ in range(rng.randint(1, 4)):
            c, w, a = rng.rand(), 0.08 + rng.rand() * 0.4, 0.3 + rng.rand()
            s += a * np.exp(-((t - c) / w) ** 2)
        out[i] = s / s.max()
    return out


def spectralized_naturals(n, bands, size, seed):
    """RGB crops -> cubes via random smooth spectral response."""
    rgb = natural_crops(n, size, 3, seed=seed)  # [n, H, W, 3]
    rng = np.random.RandomState(seed + 131)
    cubes = np.zeros((n, bands, size, size), np.float32)
    for i in range(n):
        w = _smooth_spectra(rng, 3, bands).T  # [bands, 3]
        w /= w.sum(1, keepdims=True) + 1e-6
        gain = _smooth_spectra(rng, 1, bands)[0] * (0.7 + 0.5 * rng.rand())
        cubes[i] = np.einsum("bc,hwc->bhw", w, rgb[i]) * gain[:, None, None]
    return np.clip(cubes, 0.0, 1.0)


def mixing_model_cubes(n, bands, size, seed):
    """Linear mixing: smooth endmember spectra x smooth abundance maps,
    modulated by a natural grayscale texture."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(seed + 977)
    tex = natural_crops(n, size, 1, seed=seed + 13)[..., 0]  # [n, H, W]
    cubes = np.zeros((n, bands, size, size), np.float32)
    for i in range(n):
        k = rng.randint(3, 7)
        spectra = _smooth_spectra(rng, k, bands)  # [k, bands]
        fields = rng.randn(k, size, size).astype(np.float32)
        sm = 2.0 + rng.rand() * 8.0
        fields = np.stack([gaussian_filter(f, sm) for f in fields])
        ab = np.exp(3.0 * fields)
        ab /= ab.sum(0, keepdims=True)
        cube = np.einsum("kb,khw->bhw", spectra, ab)
        m = 0.3 + 0.7 * rng.rand()  # texture modulation depth
        cubes[i] = cube * ((1 - m) + m * tex[i][None])
    return np.clip(cubes, 0.0, 1.0)


def build_corpus(n, bands, size, seed):
    half = n // 2
    return np.concatenate([
        spectralized_naturals(half, bands, size, seed),
        mixing_model_cubes(n - half, bands, size, seed),
    ])


def heldout_cubes(bands=8, size=64, n=4):
    """Eval cubes spectralized from grace_hopper.jpg (never trained on),
    deterministic."""
    import matplotlib
    from PIL import Image

    path = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                        "sample_data", "grace_hopper.jpg")
    img = np.asarray(Image.open(path), np.float32) / 255.0
    rng = np.random.RandomState(4242)
    h, w = img.shape[:2]
    cubes = np.zeros((n, bands, size, size), np.float32)
    for i in range(n):
        top, left = rng.randint(h - size + 1), rng.randint(w - size + 1)
        crop = img[top:top + size, left:left + size]
        wmat = _smooth_spectra(rng, 3, bands).T
        wmat /= wmat.sum(1, keepdims=True) + 1e-6
        cubes[i] = np.einsum("bc,hwc->bhw", wmat, crop)
    return np.clip(cubes, 0.0, 1.0)


def make_model(base=8):
    # base=8: half-width GRUnet (~14 MB) — capacity beyond the compact
    # nets does not pay on the offline corpus (weights/README findings
    # 1/10); base=16 reproduces the reference checkpoint layout
    return GRUnet(in_ch=2, out_ch=1, use_noise_map=True, bn=False, base=base)


def apply_denoise(model, params, cubes, sigma_map):
    """cubes: [B, Bands, H, W]; sigma_map broadcastable to it."""
    ndhwc = cubes[..., None]
    smap = jnp.ones_like(ndhwc) * sigma_map[..., None]
    inp = jnp.concatenate([ndhwc, smap], axis=-1)
    return model.apply(params, inp)[..., 0]


def evaluate(model, params, cubes, sigmas=(0.01, 0.1, 0.2), tag=""):
    cubes = jnp.asarray(cubes)

    @jax.jit
    def den(c, s):
        return apply_denoise(model, params, c, s)

    res = []
    for s in sigmas:
        key = jax.random.key(int(s * 1000))
        noisy = cubes + s * jax.random.normal(key, cubes.shape)
        out = den(noisy, jnp.full(cubes.shape, s))
        mse_n = float(jnp.mean((noisy - cubes) ** 2))
        mse_d = float(jnp.mean((out - cubes) ** 2))
        p_n, p_d = -10 * np.log10(mse_n), -10 * np.log10(mse_d)
        print(f"  {tag}sigma={s}: noisy {p_n:5.2f} -> denoised {p_d:5.2f} dB",
              flush=True)
        res.append(p_d)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--n-cubes", type=int, default=512)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--sigma-max", type=float, default=0.3)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=SCRATCH)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--resume-from", type=str, default=None)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--base", type=int, default=8,
                    help="GRUnet width multiplier (8 = shipped tiny; "
                         "12/16 = wider variants, round-5 candidate)")
    args = ap.parse_args()

    model = make_model(base=args.base)
    init = model.init(jax.random.key(args.seed),
                      jnp.zeros((1, 4, 16, 16, 2)))
    if args.eval_only or args.resume or args.resume_from:
        src = args.resume_from or WEIGHTS
        with open(src, "rb") as f:
            params = serialization.from_bytes(init, f.read())
        print(f"loaded {src}", flush=True)
        if args.eval_only:
            evaluate(model, params, heldout_cubes(args.bands, args.size),
                     tag="heldout ")
            return
    else:
        params = init

    print("building corpus...", flush=True)
    data = jnp.asarray(build_corpus(args.n_cubes, args.bands, args.size,
                                    args.seed))
    eval_cubes = heldout_cubes(args.bands, args.size)

    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.02)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(params)

    def one_step(data, carry, key):
        params, opt_state = carry
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        idx = jax.random.randint(k1, (args.batch,), 0, args.n_cubes)
        clean = data[idx]  # [B, Bands, H, W]
        u = jax.random.uniform(k2, (args.batch,))
        # half uniform, half u^2 (low-sigma emphasis): the first 6k-step
        # run with pure-uniform sigmas capped at ~31 dB fidelity on a
        # CLEAN input at sigma=0.01 — inside PnP that ceiling destroys
        # data-term-driven tasks (misr: 24 vs TV 48 dB). The residual
        # head can only learn near-identity if low sigmas are SEEN.
        u = jnp.where(jnp.arange(args.batch) % 2 == 0, u, u * u)
        sigma = args.sigma_max * u
        # non-iid per-band envelope on half the batch (dphsir condition)
        env = 0.5 + jax.random.uniform(k4, (args.batch, args.bands))
        env = (env + jnp.roll(env, 1, 1) + jnp.roll(env, -1, 1)) / 3.0
        iid = jax.random.bernoulli(k5, 0.5, (args.batch,))
        band_sigma = jnp.where(iid[:, None], sigma[:, None],
                               sigma[:, None] * env)
        smap = band_sigma[:, :, None, None]
        noisy = clean + smap * jax.random.normal(k3, clean.shape)

        def loss_fn(p):
            den = apply_denoise(model, p, noisy,
                                jnp.broadcast_to(smap, clean.shape))
            return jnp.mean((den - clean) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, upd)
        return (params, opt_state), loss

    from functools import partial as _partial

    @jax.jit
    def run_chunk(params, opt_state, key, data):
        keys = jax.random.split(key, args.chunk)
        (params, opt_state), losses = jax.lax.scan(
            _partial(one_step, data), (params, opt_state), keys)
        return params, opt_state, jnp.mean(losses)

    key = jax.random.key(args.seed + 1)
    t0 = time.time()
    for i in range(args.steps // args.chunk):
        key, sub = jax.random.split(key)
        params, opt_state, loss = run_chunk(params, opt_state, sub, data)
        if i % 5 == 0:
            print(f"step {(i + 1) * args.chunk}/{args.steps} "
                  f"loss {float(loss):.6f} ({time.time() - t0:.0f}s)",
                  flush=True)
        if i % 20 == 19:
            # periodic checkpoint: the axon TPU worker can crash
            # mid-run (lost a 9.5k-step run to one) — make restarts
            # cheap. tmp+rename so a crash/read mid-write can't leave a
            # truncated file
            tmp = args.out + ".ckpt.tmp"
            with open(tmp, "wb") as f:
                f.write(serialization.to_bytes(jax.device_get(params)))
            os.replace(tmp, args.out + ".ckpt")

    evaluate(model, params, eval_cubes, tag="heldout ")
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    print(f"saved {args.out} ({os.path.getsize(args.out) // 1024} KB)")


if __name__ == "__main__":
    main()
