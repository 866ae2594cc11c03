"""Asset hub: weight/dataset lookup with the reference's API shape.

Counterpart of /root/reference/dprox/utils/huggingface.py
(load_path / load_checkpoint / download_dataset). Lookups search local
caches first; on a miss, when downloads are enabled
(``DPROX_ALLOW_DOWNLOAD=1`` or ``set_download_enabled(True)``), assets
are fetched from huggingface.co/delta-prox into ``~/.cache/dprox``
(same URL layout as reference huggingface.py:50-66). Downloads default
OFF because this build environment has no egress — the error message on
a miss says how to enable them.
"""
from __future__ import annotations

import os
import urllib.request
from typing import Optional

CACHE_DIRS = [
    os.environ.get("DPROX_CACHE", ""),
    os.path.expanduser("~/.cache/dprox"),
    os.path.expanduser("~/.cache/dprox_tpu"),
    os.path.join(os.path.dirname(__file__), "..", "..", "weights"),
]

_DOWNLOAD_ENABLED = os.environ.get("DPROX_ALLOW_DOWNLOAD", "") == "1"
HF_USER = "delta-prox"


def set_download_enabled(enabled: bool) -> None:
    """Opt in to fetching missing assets from the HuggingFace hub."""
    global _DOWNLOAD_ENABLED
    _DOWNLOAD_ENABLED = bool(enabled)


def _hub_url(rel_path: str, repo_type: str = "models",
             user_id: str = HF_USER) -> str:
    """HuggingFace resolve-URL for ``<repo>/<path...>`` asset ids
    (reference huggingface.py:53-59: datasets carry a /datasets prefix,
    models none)."""
    parts = rel_path.replace("\\", "/").split("/")
    repo_id, path = parts[0], "/".join(parts[1:])
    base = "https://huggingface.co"
    if repo_type in ("datasets", "dataset"):
        base += "/datasets"
    return f"{base}/{user_id}/{repo_id}/resolve/main/{path}"


def _try_download(rel_path: str, repo_type: str) -> Optional[str]:
    if not _DOWNLOAD_ENABLED or "/" not in rel_path.replace("\\", "/"):
        return None
    save_path = os.path.join(os.path.expanduser("~/.cache/dprox"), rel_path)
    url = _hub_url(rel_path, repo_type)
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    # fetch to a unique temp name and rename only on success: an
    # interrupted transfer must not leave a partial file where _search
    # would later pick it up, and concurrent downloads of the same asset
    # must not clobber each other's in-flight temp file
    import tempfile

    fd, tmp_path = tempfile.mkstemp(
        dir=os.path.dirname(save_path),
        prefix=os.path.basename(save_path) + ".", suffix=".tmp")
    os.close(fd)
    try:
        urllib.request.urlretrieve(url, filename=tmp_path)
        os.replace(tmp_path, save_path)
    except Exception as e:  # no egress / 404: fall through to the miss path
        import warnings

        if os.path.exists(tmp_path):
            os.remove(tmp_path)
        warnings.warn(f"download of {url} failed: {e}")
        return None
    return save_path


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
    """(reference: huggingface.py:36-66 — local-cache search first,
    download-on-miss behind the opt-in flag.)"""
    p = _search(rel_path)
    if p is None:
        p = _try_download(rel_path, repo_type)
    if p is None and raise_on_miss:
        raise FileNotFoundError(
            f"asset '{rel_path}' not found in {[d for d in CACHE_DIRS if d]}; "
            "place the file in ~/.cache/dprox, or enable hub downloads with "
            "DPROX_ALLOW_DOWNLOAD=1 / dprox_tpu.utils.hub.set_download_enabled"
            "(True) (requires network access)")
    return p


def load_checkpoint(rel_path: str, **kwargs):
    """Load a torch checkpoint from the local cache
    (reference: huggingface.py:69-77)."""
    import torch

    return torch.load(load_path(rel_path), map_location="cpu", **kwargs)


def download_dataset(name: str, raise_on_miss: bool = False) -> Optional[str]:
    """Resolve a dataset directory from the local cache; with downloads
    enabled, snapshot the repo via huggingface_hub when installed
    (reference: huggingface.py:80-93)."""
    p = _search(name)
    if p is None and _DOWNLOAD_ENABLED:
        try:
            import huggingface_hub

            local_dir = os.path.join(os.path.expanduser("~/.cache/dprox"),
                                     name)
            huggingface_hub.snapshot_download(
                repo_id=f"{HF_USER}/{name}", local_dir=local_dir,
                repo_type="dataset")
            p = local_dir
        except Exception as e:
            import warnings

            warnings.warn(f"dataset snapshot of '{name}' failed: {e}")
    if p is None and raise_on_miss:
        raise FileNotFoundError(
            f"dataset '{name}' not cached locally (set "
            "DPROX_ALLOW_DOWNLOAD=1 to fetch from the hub)")
    return p
