"""Problem-rewrite passes: absorb linops into proxfns.

Counterpart of /root/reference/dprox/algo/opt/absorb.py: fold ``scale``
into fn.beta; fold a diagonal ``mosaic`` data term into a closed-form
``weighted_sum_squares``.
"""
from __future__ import annotations

from ..linop.base import scale
from ..linop.ops import mosaic
from ..proxfn.sum_squares import sum_squares, weighted_sum_squares


def absorb_all_linops(prox_fns):
    new_proxes, ready = [], list(prox_fns)
    while ready:
        curr = ready.pop(0)
        absorbed = absorb_linop(curr)
        if len(absorbed) == 1 and absorbed[0] is curr:
            new_proxes.append(curr)
        else:
            ready.extend(absorbed)
    return new_proxes


def absorb_linop(prox_fn):
    if isinstance(prox_fn.linop, mosaic) and isinstance(prox_fn, sum_squares):
        var_shapes = None
        # offset of sum_squares(mosaic(x), b): b was either explicit or a constant
        b = prox_fn._b
        if b is None:
            raise ValueError("mosaic absorb requires sum_squares(mosaic(x), b=...)")
        new_fn = weighted_sum_squares(prox_fn.linop.children[0], prox_fn.linop, b)
        return [new_fn]
    if isinstance(prox_fn.linop, scale):
        scalar = prox_fn.linop.scalar
        prox_fn.linop = prox_fn.linop.children[0]
        prox_fn.beta = prox_fn.beta * scalar
        return [prox_fn]
    return [prox_fn]
