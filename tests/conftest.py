"""Test configuration: run on a virtual 8-device CPU mesh.

Tests must be deterministic and CPU-runnable; multi-chip sharding tests
use XLA's host-platform device emulation. Benchmarks (bench.py) run on
real TPU hardware outside pytest.

Note: the axon sitecustomize pre-imports jax and pins the platform, so
the env var alone is not enough — we must also update jax.config here
(conftest runs before any test module imports dprox_tpu).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
