"""Probe XLA's conv-chain efficiency at the flagship denoiser's internal
shape (VERDICT r4 #3 follow-on; decides whether a Pallas fused conv-chain
kernel has headroom worth writing).

The distilled_color student runs 10 3x3 convs at 1024^2 x nc=96 inside a
2048^2 flagship iteration (after pixel-unshuffle).  flagship_2048.py
attributed ~39 ms to the deep branch == ~37 raw TFLOP/s == ~40% of the
padded bf16 MXU peak.  Questions this probe answers on the real chip:

  * raw TFLOP/s of a bare 10-layer conv chain (no shuffles/concats) at
    1024^2x96, f32 vs bf16 -> how much of the deep-branch cost is the
    conv itself vs the relayout plumbing around it;
  * nc=128 variant (FLOP-normalized) -> is the 96-lane padding the gap;
  * a jnp "9 shifted matmuls" formulation (what a Pallas kernel would
    do on the MXU) -> does the matmul formulation beat XLA's native
    conv lowering at these shapes at all.

    python benchmarks/conv_chain_probe.py
"""
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


def chain_flops(H, W, nc, nb):
    # 13->nc, (nb-2)x nc->nc, nc->12, all 3x3
    return 2 * H * W * 9 * (13 * nc + (nb - 2) * nc * nc + nc * 12)


def make_chain(nc, nb, dtype):
    k = jax.random.key(0)
    ws = [jax.random.normal(k, (3, 3, 13, nc), dtype) * 0.05]
    for _ in range(nb - 2):
        ws.append(jax.random.normal(k, (3, 3, nc, nc), dtype) * 0.05)
    ws.append(jax.random.normal(k, (3, 3, nc, 12), dtype) * 0.05)

    @jax.jit
    def run(x, ws):
        for i, w in enumerate(ws):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if i < len(ws) - 1:
                x = jnp.maximum(x, 0)
        return x
    return run, ws


def make_shifted_matmul_chain(nc, nb, dtype):
    """The formulation a Pallas kernel would use: 3x3 conv as 9 shifted
    [H*W, cin] @ [cin, cout] matmuls (here expressed in jnp so XLA
    compiles it; a hand kernel could only be faster than THIS by fusing
    layers in VMEM, not by better matmul scheduling)."""
    k = jax.random.key(0)
    ws = [jax.random.normal(k, (9, 13, nc), dtype) * 0.05]
    for _ in range(nb - 2):
        ws.append(jax.random.normal(k, (9, nc, nc), dtype) * 0.05)
    ws.append(jax.random.normal(k, (9, nc, 12), dtype) * 0.05)

    @jax.jit
    def run(x, ws):
        N, H, W, _ = x.shape
        for i, w in enumerate(ws):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = None
            for o in range(9):
                di, dj = o // 3, o % 3
                sl = xp[:, di:di + H, dj:dj + W, :]
                y = jnp.einsum("nhwc,cd->nhwd", sl, w[o],
                               preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
            x = acc.astype(dtype)
            if i < len(ws) - 1:
                x = jnp.maximum(x, 0)
        return x
    return run, ws


def main():
    H = W = 1024
    nb = 10
    rows = []
    for label, nc, dtype, maker in [
        ("xla_conv_f32_nc96", 96, jnp.float32, make_chain),
        ("xla_conv_bf16_nc96", 96, jnp.bfloat16, make_chain),
        ("xla_conv_bf16_nc128", 128, jnp.bfloat16, make_chain),
        ("shifted_matmul_bf16_nc96", 96, jnp.bfloat16,
         make_shifted_matmul_chain),
    ]:
        run, ws = maker(nc, nb, dtype)
        x = jax.random.normal(jax.random.key(1), (1, H, W, 13), dtype)
        try:
            t = sustained(run, x, ws)
            fl = chain_flops(H, W, nc, nb)
            rows.append({"row": label, "ms": round(t * 1e3, 2),
                         "raw_tflops": round(fl / t / 1e12, 1)})
        except Exception as e:  # pragma: no cover
            rows.append({"row": label, "error": repr(e)[:120]})
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
