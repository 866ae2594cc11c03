"""Probe formulations of the flagship denoiser's FUSED FIRST CONV at
2048^2 (the residual per-pixel-gap item from COVERAGE round-5 notes).

The boundary-fused FFDNet (models/ffdnet.py::fused_apply, finding 22)
runs its first layer as a 6x6 stride-2 conv with cin=4 (RGB + sigma
map).  Measured 5.5 ms at 2048^2 on v5e vs 1.9 ms for a half-res 3x3
nc->nc layer — i.e. ~5.3 true TFLOP/s.  Padded-flop arithmetic says
why: the MXU lane-pads cin 4->128, so the padded work is
2*1024^2*96*36*128 = 924 GFLOP == ~168 TFLOP/s — the conv is running AT
the MXU roofline and burning 97% of it on channel padding.

The fix candidates raise true cin by a POLYPHASE split that needs no
intra-row data movement (channels-last s2d is a row-deinterleave plus a
free minor-dim reshape: row (2048,4) viewed as (1024,8) IS the
column-polyphase layout; the 6-D-transpose copy that finding 22 killed
is not needed because we are free to permute the weight tensor
instead):

  A. baseline: 6x6 stride-2 conv, cin=4 (current fused_apply layer 1)
  B. row-deinterleave -> two (1024,1024,8) tensors -> two 3x3 convs
     (cin=8) summed — no channel concat at all
  C. as B but concat to cin=16 and run ONE 3x3 conv
  D. reference loose bound: the plain half-res 3x3 96->96 layer

    python benchmarks/first_conv_probe.py [--size 2048] [--nc 96]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp


def sustained(fn, *args, reps=3, inner=30):
    """Per-application time with `inner` applications inside ONE jitted
    scan — isolated single calls through the relay carry a ~25 ms
    dispatch floor (COVERAGE r5), so only in-program repetition
    measures the op. Inputs are scaled per-step so nothing CSEs."""

    @jax.jit
    def many(x0):
        def body(acc, s):
            return acc + jnp.mean(jnp.abs(fn(x0 * s))), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(()),
                              1.0 + jnp.arange(inner) * 1e-6)
        return acc

    x0 = args[0]
    float(many(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(x0))
        best = min(best, time.perf_counter() - t0)
    return best / inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--nc", type=int, default=96)
    args = ap.parse_args()
    S, nc = args.size, args.nc
    h = S // 2

    key = jax.random.key(0)
    x = jax.random.normal(key, (1, S, S, 4), jnp.float32)
    W6 = jax.random.normal(key, (6, 6, 4, nc), jnp.float32) * 0.05
    W8a = jax.random.normal(key, (3, 3, 8, nc), jnp.float32) * 0.05
    W8b = jax.random.normal(key, (3, 3, 8, nc), jnp.float32) * 0.05
    W16 = jax.random.normal(key, (3, 3, 16, nc), jnp.float32) * 0.05
    Wmid = jax.random.normal(key, (3, 3, nc, nc), jnp.float32) * 0.05
    y_half = jax.random.normal(key, (1, h, h, nc), jnp.float32)

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def conv_a(x):
        return jax.lax.conv_general_dilated(
            x, W6, (2, 2), ((2, 2), (2, 2)), dimension_numbers=dn)

    @jax.jit
    def conv_b(x):
        ev = x[:, 0::2].reshape(1, h, h, 8)
        od = x[:, 1::2].reshape(1, h, h, 8)
        return (jax.lax.conv_general_dilated(ev, W8a, (1, 1), "SAME",
                                             dimension_numbers=dn)
                + jax.lax.conv_general_dilated(od, W8b, (1, 1), "SAME",
                                               dimension_numbers=dn))

    @jax.jit
    def conv_c(x):
        ev = x[:, 0::2].reshape(1, h, h, 8)
        od = x[:, 1::2].reshape(1, h, h, 8)
        z = jnp.concatenate([ev, od], axis=-1)
        return jax.lax.conv_general_dilated(z, W16, (1, 1), "SAME",
                                            dimension_numbers=dn)

    @jax.jit
    def conv_d(y):
        return jax.lax.conv_general_dilated(y, Wmid, (1, 1), "SAME",
                                            dimension_numbers=dn)

    rows = []
    for name, fn, a in (("A 6x6s2 cin4", conv_a, x),
                        ("B 2x conv cin8", conv_b, x),
                        ("C concat cin16", conv_c, x),
                        ("D mid 3x3 96ch", conv_d, y_half)):
        t = sustained(fn, a)
        rows.append((name, t * 1e3))
        print(f"{name:18s} {t * 1e3:8.2f} ms")

    print({n: round(t, 3) for n, t in rows})


if __name__ == "__main__":
    main()
