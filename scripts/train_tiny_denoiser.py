"""Train the compact "tiny_ffdnet" denoisers shipped in weights/.

The reference ships pretrained FFDNet/DRUNet/... weights from
HuggingFace (reference: dprox/utils/huggingface.py:36-93); this
environment has zero egress, so we train compact FFDNets (nc=32, nb=8)
in-repo on deterministic synthetic textured images and ship the
msgpack-serialized params. Usage:

    python scripts/train_tiny_denoiser.py --channels 1   # gray
    python scripts/train_tiny_denoiser.py --channels 3   # color

Training runs on whatever backend JAX selects (TPU under axon); steps
are batched into jitted lax.scan chunks so relay dispatch overhead is
amortized.
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

from dprox_tpu.models import FFDNet


# --------------------------------------------------------------------------- #
# Deterministic synthetic image corpus: piecewise-constant shapes, smooth
# gradients, sinusoidal textures, and blurred noise fields — enough visual
# statistics (edges, flats, textures) for a denoiser prior to be useful on
# natural images.
# --------------------------------------------------------------------------- #

def synth_images(n: int, size: int, channels: int, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    out = np.zeros((n, size, size, channels), np.float32)
    for i in range(n):
        img = np.zeros((size, size, channels), np.float32)
        # smooth background gradient
        a, b, c = rng.rand(3, channels).astype(np.float32)
        img += a * yy[..., None] + b * xx[..., None] + 0.3 * c
        # random rectangles / ellipses
        for _ in range(rng.randint(2, 8)):
            cy, cx = rng.rand(2) * size
            hy, hx = rng.rand(2) * size * 0.3 + 2
            col = rng.rand(channels).astype(np.float32)
            if rng.rand() < 0.5:
                mask = (np.abs(np.arange(size)[:, None] - cy) < hy) & \
                       (np.abs(np.arange(size)[None, :] - cx) < hx)
            else:
                mask = (((np.arange(size)[:, None] - cy) / hy) ** 2 +
                        ((np.arange(size)[None, :] - cx) / hx) ** 2) < 1.0
            img[mask] = col
        # sinusoidal texture band
        if rng.rand() < 0.7:
            f = rng.rand(2) * 16 + 1
            ph = rng.rand() * 6.28
            tex = 0.5 + 0.5 * np.sin(2 * np.pi * (f[0] * yy + f[1] * xx) + ph)
            w = rng.rand() * 0.4
            img = (1 - w) * img + w * tex[..., None]
        # blurred noise field (low-frequency clutter)
        if rng.rand() < 0.5:
            z = rng.randn(size // 8, size // 8, channels).astype(np.float32)
            z = np.kron(z, np.ones((8, 8, 1), np.float32))
            img += 0.15 * z
        # 1/f ("pink") field — natural-image spectral statistics
        if rng.rand() < 0.7:
            fy = np.fft.fftfreq(size)[:, None]
            fx = np.fft.fftfreq(size)[None, :]
            amp = 1.0 / np.maximum(np.sqrt(fy ** 2 + fx ** 2), 1.0 / size)
            spec = (rng.randn(size, size, channels) +
                    1j * rng.randn(size, size, channels))
            pink = np.real(np.fft.ifft2(spec * amp[..., None], axes=(0, 1)))
            pink = (pink - pink.min()) / (np.ptp(pink) + 1e-9)
            w = rng.rand() * 0.6 + 0.2
            img = (1 - w) * img + w * pink.astype(np.float32)
        out[i] = np.clip(img, 0.0, 1.0)
    return out


# Photographic textures bundled with other installed packages (zero-egress
# environment). Curated: real photographs of materials/surfaces only — no
# logos, diagrams, or flat tints. Missing entries are skipped so the
# corpus stays buildable across environments.
_SITE_TEXTURES = [
    ("gymnasium_robotics", "envs/assets/kitchen_franka/kitchen_assets/"
     "textures/wood1.png"),
    ("gymnasium_robotics", "envs/assets/kitchen_franka/kitchen_assets/"
     "textures/white_marble_tile.png"),
    ("gymnasium_robotics", "envs/assets/kitchen_franka/kitchen_assets/"
     "textures/white_marble_tile2.png"),
    ("gymnasium_robotics", "envs/assets/adroit_hand/resources/textures/"
     "darkwood.png"),
    ("gymnasium_robotics", "envs/assets/adroit_hand/resources/textures/"
     "silverRaw.png"),
    ("gymnasium_robotics", "envs/assets/adroit_hand/resources/textures/"
     "skin.png"),
    ("dm_control", "suite/dog_assets/skin_texture.png"),
    ("dm_control", "locomotion/arenas/assets/outdoor_natural/"
     "OutdoorGrassFloorD.png"),
    ("dm_control", "locomotion/arenas/assets/outdoor_natural/"
     "OutdoorSkybox2048.png"),
    ("dm_control", "locomotion/soccer/assets/pitch/pitch_m.png"),
    ("labmaze", "assets/style_01/floor_red_team_d.png"),
    ("labmaze", "assets/style_02/wall_yellow_d.png"),
    ("labmaze", "assets/style_03/floor_purple_d.png"),
    ("labmaze", "assets/style_05/floor_orange_bright_d.png"),
    ("labmaze", "assets/sky_01/up.png"),
]


def _site_texture_photos():
    import importlib

    from PIL import Image

    photos = []
    for pkg, rel in _SITE_TEXTURES:
        try:
            root = os.path.dirname(importlib.import_module(pkg).__file__)
        except ImportError:
            continue
        path = os.path.join(root, rel)
        if not os.path.exists(path):
            continue
        img = Image.open(path).convert("RGB")
        # cap huge assets so corpus build stays fast
        if max(img.size) > 1024:
            f = 1024 / max(img.size)
            img = img.resize((int(img.size[0] * f), int(img.size[1] * f)),
                             Image.BILINEAR)
        photos.append(np.asarray(img, np.float32) / 255.0)
    return photos


def natural_crops(n: int, size: int, channels: int, seed: int = 0,
                  extra_textures: bool = False) -> np.ndarray:
    """Augmented random crops from the natural photographs bundled with
    sklearn (china.jpg, flower.jpg). matplotlib's grace_hopper.jpg is
    deliberately EXCLUDED — it is the held-out natural eval image in
    scripts/eval_prior_quality.py. Augmentations: random crop scale,
    flips, 90-degree rotations, channel permutation, brightness/contrast
    jitter. ``extra_textures`` adds the curated photographic textures
    bundled with other installed packages (_SITE_TEXTURES)."""
    import sklearn.datasets
    from PIL import Image

    root = os.path.join(os.path.dirname(sklearn.datasets.__file__), "images")
    photos = []
    for fname in ("china.jpg", "flower.jpg"):
        img = np.asarray(Image.open(os.path.join(root, fname)), np.float32)
        photos.append(img / 255.0)
    if extra_textures:
        photos += _site_texture_photos()

    rng = np.random.RandomState(seed + 7919)
    out = np.zeros((n, size, size, channels), np.float32)
    for i in range(n):
        img = photos[rng.randint(len(photos))]
        h, w = img.shape[:2]
        # crop at a random scale in [size, 3*size], resize down to size
        s = rng.randint(size, min(3 * size, h, w) + 1)
        top, left = rng.randint(h - s + 1), rng.randint(w - s + 1)
        patch = img[top:top + s, left:left + s]
        if s != size:
            patch = np.asarray(
                Image.fromarray((patch * 255).astype(np.uint8)).resize(
                    (size, size), Image.BILINEAR), np.float32) / 255.0
        if rng.rand() < 0.5:
            patch = patch[:, ::-1]
        if rng.rand() < 0.5:
            patch = patch[::-1]
        patch = np.rot90(patch, rng.randint(4))
        patch = patch[..., rng.permutation(3)]
        # brightness / contrast jitter
        gain = 0.7 + 0.6 * rng.rand()
        bias = 0.2 * (rng.rand() - 0.5)
        patch = np.clip(gain * (patch - 0.5) + 0.5 + bias, 0.0, 1.0)
        if channels == 1:
            patch = patch.mean(-1, keepdims=True)
        out[i] = patch
    return out


def build_corpus(corpus: str, n_images: int, size: int, channels: int,
                 seed: int) -> np.ndarray:
    if corpus == "synthetic":
        return synth_images(n_images, size, channels, seed)
    if corpus == "natural":
        return natural_crops(n_images, size, channels, seed)
    if corpus == "mixed":
        half = n_images // 2
        return np.concatenate([
            synth_images(half, size, channels, seed),
            natural_crops(n_images - half, size, channels, seed),
        ])
    if corpus == "mixed_plus":
        # 1/3 synthetic, 2/3 natural incl. the curated site-package
        # photographic textures (wood/marble/skin/grass/sky)
        third = n_images // 3
        return np.concatenate([
            synth_images(third, size, channels, seed),
            natural_crops(n_images - third, size, channels, seed,
                          extra_textures=True),
        ])
    raise ValueError(f"unknown corpus {corpus!r}")


def colored_noise(key, shape, alpha):
    """Unit-std noise with radial spectral envelope f^alpha per sample.

    alpha < 0: low-frequency ("pink") noise; alpha > 0: high-frequency
    noise resembling the inverse-filter ringing a PnP prior faces inside
    ADMM x-updates. Shape: (B, H, W, C); alpha: (B,)."""
    b, h, w, c = shape
    white = jax.random.normal(key, shape)
    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.fftfreq(w)[None, :]
    f = jnp.sqrt(fy**2 + fx**2)
    f = jnp.maximum(f, 1.0 / max(h, w))
    env = f[None, :, :, None] ** alpha[:, None, None, None]
    spec = jnp.fft.fft2(white, axes=(1, 2)) * env
    out = jnp.real(jnp.fft.ifft2(spec, axes=(1, 2)))
    std = jnp.std(out, axis=(1, 2, 3), keepdims=True)
    return out / (std + 1e-8)


def train(channels: int, nc: int = 32, nb: int = 8, size: int = 64,
          n_images: int = 512, batch: int = 32, steps: int = 15000,
          chunk: int = 200, lr: float = 1e-3, sigma_max: float = 0.3,
          seed: int = 0, out_path: str | None = None,
          corpus: str = "synthetic", noise: str = "white",
          residual: bool = False, sigma_dist: str = "uniform",
          arch: str = "ffdnet", clip: float = 0.0):
    if arch == "drunet":
        # compact UNetRes: 4 scales at nc/…, noise-map input channel;
        # `residual` is applied outside the net (x - net(x,σ)) to keep
        # exact identity at σ→0, matching DRUNetDenoiser(residual=True)
        from dprox_tpu.models import UNetRes

        net = UNetRes(in_nc=channels + 1, out_nc=channels,
                      nc=(nc, 2 * nc, 4 * nc, 8 * nc), nb=nb)

        class _Wrap:
            def init(self, key, x, s):
                smap = jnp.ones_like(x[..., :1]) * s
                return net.init(key, jnp.concatenate([x, smap], -1))

            def apply(self, p, x, s):
                smap = jnp.ones_like(x[..., :1]) * jnp.reshape(
                    jnp.asarray(s, x.dtype), (-1, 1, 1, 1))
                out = net.apply(p, jnp.concatenate([x, smap], -1))
                return x - out if residual else out

        model = _Wrap()
    else:
        model = FFDNet(in_nc=channels, out_nc=channels, nc=nc, nb=nb,
                       residual=residual)
    data = jnp.asarray(build_corpus(corpus, n_images, size, channels, seed))

    params = model.init(jax.random.key(seed),
                        jnp.zeros((1, size, size, channels)), jnp.zeros(()))
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.02)
    # clip>0 guards the larger UNetRes configs: nc=48/nb=3 at lr 1e-3
    # diverged without it (loss 3e7 by 120k steps)
    tx = optax.chain(optax.clip_by_global_norm(clip), optax.adam(sched)) \
        if clip > 0 else optax.adam(sched)
    opt_state = tx.init(params)

    def one_step(data, carry, key):
        params, opt_state = carry
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        idx = jax.random.randint(k1, (batch,), 0, n_images)
        clean = data[idx]
        u = jax.random.uniform(k2, (batch,))
        # "sq": p(sigma) emphasizes LOW noise levels (median 0.25*max) —
        # late PnP-ADMM iterations run the denoiser at small sigma, where
        # fidelity matters most
        sigma = sigma_max * (u**2 if sigma_dist == "sq" else u)
        if noise == "colored":
            # half the batch white, half spectrally shaped f^alpha
            alpha = jax.random.uniform(k4, (batch,), minval=-1.5, maxval=1.5)
            alpha = jnp.where(jax.random.bernoulli(k5, 0.5, (batch,)),
                              alpha, jnp.zeros_like(alpha))
            n = colored_noise(k3, clean.shape, alpha)
        else:
            n = jax.random.normal(k3, clean.shape)
        noisy = clean + sigma[:, None, None, None] * n

        def loss_fn(p):
            den = model.apply(p, noisy, sigma)
            return jnp.mean((den - clean) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, upd)
        return (params, opt_state), loss

    from functools import partial as _partial

    @jax.jit
    def run_chunk(params, opt_state, key, data):
        # the corpus rides as an ARGUMENT: closed over it becomes an HLO
        # constant that the remote-compile relay must buffer (>=340 MB at
        # 3072x96^2x3 blew its HTTP 413 limit); as a parameter only the
        # shape travels with the program
        keys = jax.random.split(key, chunk)
        (params, opt_state), losses = jax.lax.scan(
            _partial(one_step, data), (params, opt_state), keys)
        return params, opt_state, jnp.mean(losses)

    key = jax.random.key(seed + 1)
    for i in range(steps // chunk):
        key, sub = jax.random.split(key)
        params, opt_state, loss = run_chunk(params, opt_state, sub, data)
        if i % 5 == 0:
            print(f"step {(i + 1) * chunk}/{steps} loss {float(loss):.6f}",
                  flush=True)

    # quick eval at sigma=0.1
    rng = np.random.RandomState(123)
    clean = jnp.asarray(synth_images(16, size, channels, seed=999))
    noisy = clean + 0.1 * jnp.asarray(rng.randn(*clean.shape), jnp.float32)
    den = model.apply(params, noisy, jnp.full((16,), 0.1))
    def psnr(a, b):
        return -10 * np.log10(float(jnp.mean((a - b) ** 2)))
    print(f"eval sigma=0.1: noisy {psnr(noisy, clean):.2f} dB -> "
          f"denoised {psnr(den, clean):.2f} dB")

    name = {1: "tiny_ffdnet_gray", 3: "tiny_ffdnet_color"}[channels]
    out_path = out_path or os.path.join(os.path.dirname(__file__), "..",
                                        "weights", f"{name}.msgpack")
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    print(f"saved {out_path} ({os.path.getsize(out_path) // 1024} KB)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1, choices=(1, 3))
    ap.add_argument("--steps", type=int, default=15000)
    ap.add_argument("--nc", type=int, default=32)
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--corpus", type=str, default="synthetic",
                    choices=("synthetic", "natural", "mixed", "mixed_plus"))
    ap.add_argument("--noise", type=str, default="white",
                    choices=("white", "colored"))
    ap.add_argument("--n-images", type=int, default=512)
    ap.add_argument("--residual", action="store_true")
    ap.add_argument("--sigma-dist", type=str, default="uniform",
                    choices=("uniform", "sq"))
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--clip", type=float, default=0.0,
                    help="global-norm gradient clip (0 = off)")
    ap.add_argument("--chunk", type=int, default=200,
                    help="steps per jitted scan; lower it if the remote-"
                         "compile relay rejects the program (HTTP 413)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arch", type=str, default="ffdnet",
                    choices=("ffdnet", "drunet"))
    args = ap.parse_args()
    train(args.channels, nc=args.nc, nb=args.nb, steps=args.steps,
          out_path=args.out, corpus=args.corpus, n_images=args.n_images,
          noise=args.noise, residual=args.residual,
          sigma_dist=args.sigma_dist, size=args.size, batch=args.batch,
          lr=args.lr, seed=args.seed, arch=args.arch, chunk=args.chunk,
          clip=args.clip)
