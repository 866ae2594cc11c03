"""Minimal repro: large DEVICE-array jit closure constants are lowered
corrupted by the axon backend inside big programs.

Found round-5 while distilling the width-128 student: a jitted heldout
loss that CLOSED OVER four ~7 MB device arrays returned ~0.057 (about
0.2 x cross-image MSE) while the identical computation with the arrays
passed as ARGUMENTS — or run eagerly — returned the true ~0.001. The
failure needs all three ingredients:

  * the constants are DEVICE arrays (numpy closures are baked as HLO
    literals and are fine);
  * they are multi-MB;
  * the program is large (a 10-layer CNN; a bare subtract+mean over the
    same closed-over arrays is exact).

The corruption is deterministic across calls, and the closed-over
arrays round-trip to host INTACT afterward — the bad copy lives inside
the lowered executable, not HBM. Because misaligned/corrupted images
still produce plausible loss magnitudes, this class of bug silently
poisons any eval/selection metric (it cost this repo one best-iterate
selection run). Library rule (CLAUDE.md): pass every array bigger than
a few KB through jit ARGUMENTS on this backend.

Run on the real TPU after any relay/backend update; prints PASS/FAIL.

    python benchmarks/closure_constant_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    # A plain 10x Conv+ReLU chain does NOT trigger the bug (probed) —
    # the FFDNet program shape (pixel-(un)shuffle transposes + sigma
    # broadcast + replication pad around the conv chain) does, with
    # random init as well as trained weights, nc=96 and nc=128 alike.
    from dprox_tpu.models import FFDNet

    model = FFDNet(in_nc=3, out_nc=3, nc=96, nb=10, residual=True)
    r = np.random.RandomState(7)
    clean = r.rand(64, 96, 96, 3).astype(np.float32)
    noisy = clean + 0.1 * r.randn(64, 96, 96, 3).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros(()))

    nd, cd = jnp.asarray(noisy), jnp.asarray(clean)

    def loss(p, a, b):
        return jnp.mean((model.apply(p, a, jnp.full((64,), 0.1)) - b) ** 2)

    as_arg = float(jax.jit(loss)(params, nd, cd))
    closure = float(jax.jit(lambda p: loss(p, nd, cd))(params))
    rel = abs(closure - as_arg) / max(abs(as_arg), 1e-12)
    status = "PASS" if rel < 1e-3 else "FAIL"
    print({"as_arg": as_arg, "closure": closure, "rel_diff": rel,
           "status": status})
    if status == "FAIL":
        print("closure-captured device arrays are UNSAFE on this "
              "backend: pass arrays as jit arguments.")


if __name__ == "__main__":
    main()
