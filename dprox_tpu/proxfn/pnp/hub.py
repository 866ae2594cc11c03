"""Offline weight lookup (delegates to dprox_tpu.utils.hub)."""
from __future__ import annotations

from typing import Optional

from ...utils.hub import CACHE_DIRS as SEARCH_DIRS  # noqa: F401 (back-compat)
from ...utils.hub import _search


def find_weights(filename: str) -> Optional[str]:
    return _search(filename)
