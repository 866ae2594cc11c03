"""A/B: geometric x8 self-ensemble as 8 sequential denoiser calls vs
one stacked batch-8 call (proxfn/pnp/denoisers.py::Augment).

Same FLOPs either way; the batched variant hands XLA one conv chain of
batch 8 instead of 8 chains of batch 1. Run on the real TPU:
    python benchmarks/augment_ab.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp


def sustained(fn, x, lo=4, hi=16, reps=3):
    def chain(n):
        def run(v):
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, v, None, length=n)
            return out
        return jax.jit(run)

    fns = {n: chain(n) for n in (lo, hi)}

    def timed(n):
        f = fns[n]
        float(jnp.mean(jnp.abs(f(x))))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.mean(jnp.abs(f(x))))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(lo), timed(hi)
    return (hi - lo) / max(t_hi - t_lo, 1e-9)


def main():
    from dprox_tpu.proxfn.pnp.prior import get_denoiser
    from dprox_tpu.utils import imaging

    H = W = 512
    x = jnp.asarray(imaging.sample("face")[:, :, :H, :W])
    report = {"metric": "x8_augment_ab", "shape": "x".join(map(str, x.shape)),
              "device": str(jax.devices()[0])}

    for name in ("tiny_ffdnet_color", "res_ffdnet_color"):
        den = get_denoiser(name)

        def loop8(v):
            outs = []
            for k in range(4):
                vr = jnp.rot90(v, k, axes=(-2, -1))
                outs.append(jnp.rot90(den.denoise(vr, 0.1), -k, axes=(-2, -1)))
                vf = jnp.flip(vr, axis=-1)
                outs.append(jnp.rot90(jnp.flip(den.denoise(vf, 0.1), axis=-1),
                                      -k, axes=(-2, -1)))
            return sum(outs) / 8.0

        def batch8(v):
            B = v.shape[0]
            views = []
            for k in range(4):
                vr = jnp.rot90(v, k, axes=(-2, -1))
                views.append(vr)
                views.append(jnp.flip(vr, axis=-1))
            ob = den.denoise(jnp.concatenate(views, axis=0), 0.1)
            outs = []
            for k in range(4):
                o = ob[2 * k * B:(2 * k + 1) * B]
                outs.append(jnp.rot90(o, -k, axes=(-2, -1)))
                of = ob[(2 * k + 1) * B:(2 * k + 2) * B]
                outs.append(jnp.rot90(jnp.flip(of, axis=-1), -k, axes=(-2, -1)))
            return sum(outs) / 8.0

        # numerics identical (batch axis is elementwise for conv stacks)
        d = float(jnp.max(jnp.abs(loop8(x) - batch8(x))))
        report[name] = {
            "max_abs_diff": d,
            "loop8_calls_per_s": round(sustained(loop8, x), 2),
            "batch8_calls_per_s": round(sustained(batch8, x), 2),
        }
        report[name]["speedup"] = round(
            report[name]["batch8_calls_per_s"]
            / max(report[name]["loop8_calls_per_s"], 1e-9), 3)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
