"""Checkpointing: orbax-backed when available, msgpack fallback.

SURVEY.md §5 prescribes orbax-style checkpointing of solver/optimizer
pytrees for the TPU build (the reference pickles torch dicts,
primitives.py:156-175). The training loop in algo/special/training.py
uses the flax-serialization path directly; this module adds the orbax
backend for production multi-host checkpointing.
"""
from __future__ import annotations

import os
from typing import Any, Optional

from flax import serialization


def save_pytree(path: str, tree: Any, use_orbax: Optional[bool] = None):
    """Save a pytree; orbax (async-capable, sharding-aware) if available."""
    if use_orbax is None:
        try:
            import orbax.checkpoint  # noqa: F401

            use_orbax = True
        except ImportError:
            use_orbax = False
    if use_orbax:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        return "orbax"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    return "msgpack"


def load_pytree(path: str, template: Any):
    """Load a pytree saved by :func:`save_pytree`."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path), item=template)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
