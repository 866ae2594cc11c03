"""Consensus ADMM over a device mesh.

Solves block-separable problems

    min_x  sum_i f_i(x)        (blocks i sharded over the mesh)

via global-variable consensus ADMM: each device updates its blocks'
local primal variables with the block prox, the consensus variable is
the pmean of (x_i + u_i) over the mesh axis (one ICI all-reduce per
iteration), and duals update locally. This is the distributed execution
model BASELINE.json's north star prescribes for scenario-parallel
energy-planning and batched imaging workloads; the reference has no
counterpart (single-device library, SURVEY.md §2.6).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def consensus_admm(local_prox: Callable, z0: jnp.ndarray, local_args,
                   mesh: Mesh, axis: str = "batch", max_iter: int = 50,
                   rho: float = 1.0):
    """Run consensus ADMM with ``local_prox(v, rho, block_args) -> x``.

    z0: replicated initial consensus variable [*shape].
    local_args: pytree with a leading block axis (total size n_blocks,
    sharded over ``axis``); each device vmaps the prox over its slice.

    Returns the consensus z after ``max_iter`` iterations.
    """

    def body(z0_l, args_l):
        n_local = jax.tree.leaves(args_l)[0].shape[0]
        x = jnp.broadcast_to(z0_l, (n_local,) + z0_l.shape)
        u = jnp.zeros_like(x)
        # local primal/dual are device-varying (their values diverge per
        # shard); mark them so the scan carry type is stable
        pvary = getattr(jax.lax, "pcast", None)
        if pvary is not None:
            x = jax.lax.pcast(x, axis, to="varying")
            u = jax.lax.pcast(u, axis, to="varying")
        else:  # older jax
            x = jax.lax.pvary(x, axis)
            u = jax.lax.pvary(u, axis)

        def step(carry, _):
            x, u, z = carry
            v = z[None] - u
            x = jax.vmap(lambda vv, aa: local_prox(vv, rho, aa))(v, args_l)
            # consensus: mean over local blocks, then pmean across devices
            z = jax.lax.pmean(jnp.mean(x + u, axis=0), axis)
            u = u + x - z[None]
            return (x, u, z), None

        (x, u, z), _ = jax.lax.scan(step, (x, u, z0_l), None, length=max_iter)
        return z

    fn = shard_map(body, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P())
    return jax.jit(fn)(z0, local_args)


def solve_batched_sharded(solver, x0, mesh: Mesh, params: Optional[dict] = None,
                          axis: str = "batch", max_iter: int = 24,
                          rhos=None, lams=None, **solve_kwargs):
    """Data-parallel solve: shard the image/problem batch over the mesh
    and run the WHOLE solver as one explicit-SPMD ``shard_map`` program —
    zero collectives by construction (guarded structurally in
    tests/test_comm_counts.py). Explicit shard_map rather than GSPMD
    propagation because partitioners without a sharded-fft rule (XLA CPU)
    would otherwise all-gather at every FFT in the loop; a local program
    can't."""
    from ..algo.base import encode_complex
    from .mesh import batch_sharding

    x0 = solver._prepare_x0(x0)
    rhos, lam_list = solver.defaults(rhos, lams, max_iter)
    params = dict(params) if params else {}
    B = x0.shape[0]
    n_dev = mesh.shape[axis]
    assert B % n_dev == 0, f"batch {B} must divide the {n_dev}-device axis"

    x0e = encode_complex(x0)
    pe = encode_complex(params)
    pspec = jax.tree.map(
        lambda v: P(axis) if getattr(v, "ndim", 0) >= 1
        and v.shape[0] == B else P(), pe)
    run = solver._get_jitted(False, solve_kwargs.pop("real_output", False))

    fn = shard_map(lambda b_l, r, ll, p_l: run(b_l, r, ll, p_l),
                   mesh=mesh,
                   in_specs=(P(axis), P(), P(), pspec),
                   out_specs=P(axis))
    sharding = batch_sharding(mesh, axis)
    x0e = jax.device_put(x0e, sharding)
    with mesh:
        state = jax.jit(fn)(x0e, rhos, lam_list, pe)
    return state[0]
