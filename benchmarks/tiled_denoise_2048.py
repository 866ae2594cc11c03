"""Single-device spatial tiling probe for the 2048^2 denoiser cliff
(VERDICT r4 #3, follow-on to flagship_2048.py).

flagship_2048.py attributed the 2048^2 flagship cost: deep branch
66 ms (bf16 a wash — the conv chain leaves its efficient regime above
VMEM), TV 36 ms, x-update 4.3 ms. Roofline headroom in the deep branch
is ~3-6x. This probe measures lax.map over 2x2 (and 4x1) spatial tiles
with receptive-field halos — the per-slice strategy that fixed the FFT
cliff — for the FFDNet student, the TV denoiser, and both together.
Exactness: halo >= receptive radius makes tiled == whole (checked).

    python benchmarks/tiled_denoise_2048.py [--size 2048]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp


def sustained(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.mean(jnp.abs(out)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.mean(jnp.abs(out)))
        best = min(best, time.perf_counter() - t0)
    return best


def tile_image(H, W):
    from dprox_tpu.utils import imaging

    img = np.asarray(imaging.sample("face"))
    reps = (H + img.shape[2] - 1) // img.shape[2], \
           (W + img.shape[3] - 1) // img.shape[3]
    return jnp.asarray(np.tile(img, (1, 1) + reps)[:, :, :H, :W])


def tiled_denoise(den, x, sigma, gy, gx_, halo):
    """lax.map over a gy x gx grid of overlapping tiles; crop + stitch.

    Pads the plane by `halo` (edge mode) so every tile sees a full
    halo; exact when halo >= the net's receptive radius."""
    B, C, H, W = x.shape
    th, tw = H // gy, W // gx_
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (halo, halo)),
                 mode="edge")

    coords = jnp.asarray([(iy * th, ix * tw) for iy in range(gy)
                          for ix in range(gx_)], jnp.int32)

    def one(c):
        y0, x0 = c[0], c[1]
        tile = jax.lax.dynamic_slice(
            xp, (0, 0, y0, x0), (B, C, th + 2 * halo, tw + 2 * halo))
        out = den.denoise(tile, sigma)
        return out[:, :, halo:halo + th, halo:halo + tw]

    tiles = jax.lax.map(one, coords)  # [gy*gx, B, C, th, tw]
    tiles = tiles.reshape(gy, gx_, B, C, th, tw)
    return jnp.concatenate(
        [jnp.concatenate([tiles[iy, ix] for ix in range(gx_)], axis=-1)
         for iy in range(gy)], axis=-2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    a = ap.parse_args()
    H = a.size

    from dprox_tpu.proxfn.pnp.denoisers import BF16Denoiser, TVDenoiser
    from dprox_tpu.proxfn.pnp.prior import get_denoiser

    x = tile_image(H, H)
    report = {"device": str(jax.devices()[0]), "size": H}

    deep = get_denoiser("distilled_color")
    tv = TVDenoiser()

    whole = jax.jit(lambda im: deep.denoise(im, 0.05))
    report["deep_whole_ms"] = round(sustained(whole, x) * 1e3, 2)

    for tag, gy, gx_, halo, den in (
            ("deep_2x2_h24", 2, 2, 24, deep),
            ("deep_4x1_h24", 4, 1, 24, deep),
            ("deep_4x4_h24", 4, 4, 24, deep),
            ("deep_bf16_2x2_h24", 2, 2, 24, BF16Denoiser(
                get_denoiser("distilled_color")))):
        f = jax.jit(lambda im, d=den, g=(gy, gx_, halo):
                    tiled_denoise(d, im, 0.05, g[0], g[1], g[2]))
        report[tag + "_ms"] = round(sustained(f, x) * 1e3, 2)
        if tag == "deep_2x2_h24":
            err = float(jnp.max(jnp.abs(f(x) - whole(x))))
            report["deep_2x2_max_err"] = round(err, 6)

    wtv = jax.jit(lambda im: tv.denoise(im, 0.05))
    report["tv_whole_ms"] = round(sustained(wtv, x) * 1e3, 2)
    ftv = jax.jit(lambda im: tiled_denoise(tv, im, 0.05, 2, 2, 8))
    report["tv_2x2_h8_ms"] = round(sustained(ftv, x) * 1e3, 2)
    report["tv_2x2_max_err"] = round(
        float(jnp.max(jnp.abs(ftv(x) - wtv(x)))), 6)

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
