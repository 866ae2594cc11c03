"""Device-mesh helpers for sharded solving.

No counterpart exists in the reference (single-GPU PyTorch; the only
multi-device code is DataParallel around the RL trainer —
/root/reference/dprox/algo/specialization/rl/solver.py:374-376 — see
SURVEY.md §2.6). This layer supplies the TPU-native scaling model:
named meshes + NamedSharding for batch/scenario parallelism, with XLA
inserting ICI collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axis_names: Sequence[str] = ("batch",),
                shape: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    """Build a mesh over all (or the given) devices.

    With one axis the mesh is 1-D over every device; multi-axis shapes
    must multiply to the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError("shape required for multi-axis meshes")
        shape = (len(devices),)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Shard the leading (batch) dim of BCHW tensors over ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_batch(x, mesh: Mesh, axis: str = "batch"):
    """Device-put a batched array with its batch dim sharded."""
    return jax.device_put(x, batch_sharding(mesh, axis))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
