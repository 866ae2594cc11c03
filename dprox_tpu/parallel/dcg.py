"""Distributed conjugate gradient: shard-local matvecs + psum reductions.

The batched-CG inner products of the single-chip solver
(dprox_tpu/linalg/solvers.py::bdot) reduce over per-sample dims only, so
they map directly onto per-shard partial sums + a psum over the mesh
axis (SURVEY.md §5 "Distributed communication backend"). Use this when a
single linear system spans devices (the unknown itself is sharded, e.g.
a spatially-sharded image or a scenario-stacked LP system).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def distributed_cg(A_local: Callable, b, mesh: Mesh, axis: str = "shard",
                   spec: P = None, rtol: float = 1e-6, max_iters: int = 100):
    """Solve A x = b where x/b are sharded over ``axis`` and ``A_local``
    computes the shard-local rows of A x given the local shard (any halo
    exchange is A_local's business — e.g. via jax.lax.ppermute).

    Global dot products are psum'ed over the mesh axis; the iteration is
    one jitted while_loop with all collectives compiled into it.
    """
    spec = spec if spec is not None else P(axis)

    def body(b_l):
        def gdot(p, q):
            return jax.lax.psum(jnp.vdot(p.ravel(), q.ravel()), axis)

        x = jnp.zeros_like(b_l)
        r = b_l - A_local(x)
        p = r
        rs = gdot(r, r)
        bb = gdot(b_l, b_l)
        tol2 = (rtol**2) * jnp.maximum(bb, 1e-32)

        def cond(carry):
            x, r, p, rs, k = carry
            return jnp.logical_and(k < max_iters, rs > tol2)

        def it(carry):
            x, r, p, rs, k = carry
            Ap = A_local(p)
            alpha = rs / jnp.maximum(gdot(p, Ap), 1e-32)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = gdot(r, r)
            beta = rs_new / jnp.maximum(rs, 1e-32)
            p = r + beta * p
            return x, r, p, rs_new, k + 1

        x, *_ = jax.lax.while_loop(cond, it, (x, r, p, rs, jnp.int32(0)))
        return x

    fn = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(fn)(b)
