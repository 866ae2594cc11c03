"""Functional evaluation helpers + validation for linear operators.

Counterparts of the reference's module-level eval/adjoint/gram/validate
(/root/reference/dprox/linop/comp_graph.py:342-458), expressed as pure
functions over the expression tree.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .base import LinOp, Params, Array


def _single_var(op: LinOp):
    vs = op.variables
    if len(vs) != 1:
        raise ValueError(f"expected a single-variable linop, found {len(vs)}")
    return vs[0]


def eval(op: LinOp, x: Array, params: Optional[Params] = None,
         zero_constants: bool = True) -> Array:
    """Evaluate K x for a single-variable linop (linear part by default)."""
    v = _single_var(op)
    return op.forward({v.name: x}, params, zero_constants=zero_constants)


def adjoint(op: LinOp, y: Array, params: Optional[Params] = None) -> Array:
    """Evaluate K^T y for a single-variable linop."""
    v = _single_var(op)
    acc = op.adjoint(y, params)
    return acc[v.name]


def gram(op: LinOp, x: Array, params: Optional[Params] = None) -> Array:
    """Evaluate K^T K x."""
    return adjoint(op, eval(op, x, params), params)


def validate(op: LinOp, shape=(1, 3, 16, 16), params: Optional[Params] = None,
             key=None, tol: float = 1e-4) -> bool:
    """Dot-product adjoint test: <K m, d> == <m, K^T d>.

    The reference's CompGraph.sanity_check (comp_graph.py:342-371) — the
    primary correctness oracle for every linop.
    """
    if key is None:
        key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    m = jax.random.normal(k1, shape, jnp.float32)
    Km = eval(op, m, params)
    d = jax.random.normal(k2, Km.shape, jnp.float32)
    Ktd = adjoint(op, d, params)
    lhs = jnp.sum(Km * d)
    rhs = jnp.sum(m * Ktd)
    denom = jnp.maximum(jnp.abs(lhs), jnp.abs(rhs)) + 1e-12
    rel = jnp.abs(lhs - rhs) / denom
    return bool(rel < tol)


def est_norm(op: LinOp, shape=(1, 3, 32, 32), params: Optional[Params] = None,
             iters: int = 50, key=None) -> float:
    """Power-iteration estimate of ||K||_2 (reference: comp_graph.py:389-423,
    there via scipy eigs; here a jitted power method on K^T K)."""
    if key is None:
        key = jax.random.key(0)
    x = jax.random.normal(key, shape, jnp.float32)

    def body(x, _):
        y = gram(op, x, params)
        n = jnp.linalg.norm(y.ravel())
        return y / (n + 1e-12), n

    x, ns = jax.lax.scan(body, x, None, length=iters)
    return float(jnp.sqrt(ns[-1]))
