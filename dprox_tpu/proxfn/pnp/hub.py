"""Offline weight lookup.

The reference downloads pretrained weights from
huggingface.co/delta-prox on miss (/root/reference/dprox/utils/
huggingface.py:36-66). This environment has no egress, so we search
local caches only; a miss returns None and wrappers fall back to
deterministic random init (flagged via ``Denoiser.pretrained``).
"""
from __future__ import annotations

import os
from typing import Optional

SEARCH_DIRS = [
    os.path.expanduser("~/.cache/dprox"),
    os.path.expanduser("~/.cache/dprox_tpu"),
    os.path.join(os.path.dirname(__file__), "..", "..", "..", "weights"),
]


def find_weights(filename: str) -> Optional[str]:
    for d in SEARCH_DIRS:
        for root, _, files in os.walk(d) if os.path.isdir(d) else []:
            if filename in files:
                return os.path.join(root, filename)
    return None
