"""Shared benchmark timing helpers.

Timings on the axon relay backend are forced by a host fetch (CLAUDE.md:
block_until_ready is unreliable), and sustained rates self-compose the
measured fn so fixed dispatch overhead amortizes away.
"""
import os
import time

import jax
import jax.numpy as jnp

# the axon sitecustomize pre-imports jax pinned to the TPU platform;
# honor an explicit CPU request (importing this module is enough)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("JAX_ENABLE_X64"):
    jax.config.update("jax_enable_x64", True)


def sustained(fn, x, reps: int = 100):
    """Seconds per call, steady-state: warm once, then self-compose."""
    out = fn(x)
    float(jnp.sum(out))  # warm + force
    t0 = time.perf_counter()
    out = fn(x)
    for _ in range(reps - 1):
        out = fn(out)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps
