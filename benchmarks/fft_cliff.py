"""Probe the 2048^2 deconv-FFT cliff (round-5 candidate (c)).

large_shapes.py measured deconv-FFT ADMM at 2773 / 1082 / 161 its/s for
512/1024/2048 — the 1024->2048 step costs 6.7x for 4x work. This probe
isolates WHERE the superlinearity lives:

  * raw fft2+ifft2 roundtrip per shape (the x-update's hot pair);
  * full x-update shape (fft2 -> freq divide -> ifft2);
  * layout variants: NCHW [1,3,H,H] vs batched-channels [3,H,H];
  * dtype variant: complex64 in vs real in (XLA R2C handling).

    python benchmarks/fft_cliff.py            (real TPU)

One JSON line per row; conclusions recorded in weights/README findings.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    # scalar fetch, not block_until_ready: the axon relay's
    # block_until_ready does NOT synchronize (measured 0.02 ms for 8
    # FFT roundtrips at 2048^2 — physically impossible); a host
    # transfer of a reduction over the output is the only honest sync
    def sync(o):
        return float(jnp.mean(jnp.abs(jnp.real(o))))

    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def row(name, t, H):
    # GB moved for one c64 roundtrip pass (rough: read+write per FFT dim)
    print(json.dumps({"row": name, "H": H, "ms": round(t * 1e3, 3)}),
          flush=True)


def scanned(body, n):
    @jax.jit
    def run(*args):
        c, _ = jax.lax.scan(lambda c, _: (body(c, *args[1:]), ()),
                            args[0], (), length=n)
        return c
    return run


def main():
    # scan length per shape: long enough that marginal FFT work
    # dominates the ~30 ms relay fetch floor measured in the first run
    for H, n in ((1024, 64), (2048, 16)):
        x = jnp.asarray(np.random.rand(1, 3, H, H).astype(np.float32))
        d = jnp.asarray(1.0 + np.random.rand(1, 1, H, H).astype(np.float32))
        dr = d[..., : H // 2 + 1]

        def xupdate(c, dd):
            return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(c) / dd)
                            ).astype(jnp.float32)

        def xupdate_rfft(c, dd):
            return jnp.fft.irfft2(jnp.fft.rfft2(c) / dd, s=(H, H))

        def xupdate_split(c, dd):
            # manual axis decomposition: rows, then cols
            f = jnp.fft.fft(c.astype(jnp.complex64), axis=-1)
            f = jnp.fft.fft(f, axis=-2)
            f = f / dd
            f = jnp.fft.ifft(f, axis=-2)
            return jnp.real(jnp.fft.ifft(f, axis=-1)).astype(jnp.float32)

        def xupdate_perchan(c, dd):
            # one channel at a time: 1/3 the working set per FFT
            out = jax.lax.map(
                lambda ch: jnp.real(
                    jnp.fft.ifft2(jnp.fft.fft2(ch) / dd[0, 0])),
                c[0])
            return out[None].astype(jnp.float32)

        def xupdate_perchan_rfft(c, dd):
            out = jax.lax.map(
                lambda ch: jnp.fft.irfft2(
                    jnp.fft.rfft2(ch) / dd[0, 0], s=(H, H)),
                c[0])
            return out[None].astype(jnp.float32)

        base = timeit(scanned(xupdate, n), x, d)
        row(f"xupdate{n}_base", base, H)
        row(f"xupdate{n}_rfft", timeit(scanned(xupdate_rfft, n), x, dr), H)
        row(f"xupdate{n}_split", timeit(scanned(xupdate_split, n), x, d), H)
        row(f"xupdate{n}_perchan", timeit(scanned(xupdate_perchan, n), x, d),
            H)
        row(f"xupdate{n}_perchan_rfft",
            timeit(scanned(xupdate_perchan_rfft, n), x, dr), H)


if __name__ == "__main__":
    main()
