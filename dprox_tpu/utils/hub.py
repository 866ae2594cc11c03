"""Asset hub: weight/dataset lookup with the reference's API shape.

Counterpart of /root/reference/dprox/utils/huggingface.py
(load_path / load_checkpoint / download_dataset). This environment has
no egress, so lookups search local caches only and raise an actionable
error on miss instead of downloading from huggingface.co/delta-prox.
"""
from __future__ import annotations

import os
from typing import Optional

CACHE_DIRS = [
    os.environ.get("DPROX_CACHE", ""),
    os.path.expanduser("~/.cache/dprox"),
    os.path.expanduser("~/.cache/dprox_tpu"),
    os.path.join(os.path.dirname(__file__), "..", "..", "weights"),
]


def _search(rel_path: str) -> Optional[str]:
    fname = os.path.basename(rel_path)
    for d in CACHE_DIRS:
        if not d or not os.path.isdir(d):
            continue
        cand = os.path.join(d, rel_path)
        if os.path.exists(cand):
            return cand
        for root, _, files in os.walk(d):
            if fname in files:
                return os.path.join(root, fname)
    return None


def load_path(rel_path: str, repo_type: str = "models",
              raise_on_miss: bool = True) -> Optional[str]:
    """(reference: huggingface.py:36-66 — download-on-miss replaced by
    local-cache search.)"""
    p = _search(rel_path)
    if p is None and raise_on_miss:
        raise FileNotFoundError(
            f"asset '{rel_path}' not found in {[d for d in CACHE_DIRS if d]}; "
            "this environment has no network access — place the file in "
            "~/.cache/dprox to use pretrained assets")
    return p


def load_checkpoint(rel_path: str, **kwargs):
    """Load a torch checkpoint from the local cache
    (reference: huggingface.py:69-77)."""
    import torch

    return torch.load(load_path(rel_path), map_location="cpu", **kwargs)


def download_dataset(name: str, raise_on_miss: bool = False) -> Optional[str]:
    """Resolve a dataset directory from the local cache
    (reference: huggingface.py:80-93 — snapshot download replaced)."""
    p = _search(name)
    if p is None and raise_on_miss:
        raise FileNotFoundError(f"dataset '{name}' not cached locally")
    return p
