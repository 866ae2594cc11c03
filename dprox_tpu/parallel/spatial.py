"""Spatially-sharded denoiser inference with halo exchange.

The reference scales large-image denoiser inference by recursively
splitting the image into overlapping quadrants on one GPU
(/root/reference/dprox/proxfn/pnp/denoisers/wrapper.py:112-146, DRUNet
"refield" tiling). The TPU-native version shards the image's height
axis over a mesh and exchanges ``2*halo`` boundary rows with mesh
neighbors via one ``ppermute`` pair per call, so each shard's
convolution receptive fields see true neighbor pixels.

Boundary handling matters for exactness: synthetic zero halos at the
outer image boundary would NOT reproduce the network's own SAME
padding (zeros fed as *data* acquire bias activations through deep
layers). Instead, edge shards take an enlarged one-sided halo from
their single neighbor and no synthetic padding at all, so the
network's own boundary behavior applies at the true image edge. With
``halo`` >= the network's receptive-field radius the sharded result is
EXACTLY the unsharded one — verified in tests/test_parallel.py.

This is the context-parallel axis for images that do not fit (or whose
denoiser inference dominates) on one chip: a psi-prox can run sharded
while the FFT x-update stays per-device on the batch axis.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def sharded_denoise(denoise_fn: Callable, x: jnp.ndarray, mesh: Mesh,
                    axis: str = "space", halo: int = 16,
                    batch_axis: str = None):
    """Apply ``denoise_fn(x_block) -> y_block`` ([B,C,h,W] -> same) to an
    image sharded along H over ``axis``.

    x: [B,C,H,W] with H divisible by the mesh axis size n, and
    H/n >= 2*halo. ``halo`` must cover the network's receptive-field
    radius (keep it a multiple of any pixel-unshuffle factor). Returns
    [B,C,H,W] with the same sharding.

    ``batch_axis``: additionally shard B over this mesh axis (composite
    batch x space on a 2-D mesh). The halo ppermutes still run only
    within each ``axis`` sub-group.
    """
    n = mesh.shape[axis]
    if x.shape[2] % n:
        raise ValueError(f"H={x.shape[2]} not divisible by mesh axis {n}")
    h_local = x.shape[2] // n
    if n > 1 and h_local < 2 * halo:
        raise ValueError(f"local height {h_local} < 2*halo={2 * halo}; "
                         "use fewer devices or a smaller halo")
    if n == 1:
        return denoise_fn(x)

    def body(x_l):
        idx = jax.lax.axis_index(axis)
        # exchange 2*halo rows: interior shards use half of it on each
        # side; edge shards use all of it one-sided (no synthetic pad)
        top2 = x_l[:, :, :2 * halo]
        bot2 = x_l[:, :, -2 * halo:]
        from_below = jax.lax.ppermute(top2, axis,
                                      [(i, i - 1) for i in range(1, n)])
        from_above = jax.lax.ppermute(bot2, axis,
                                      [(i, i + 1) for i in range(n - 1)])
        interior = jnp.concatenate(
            [from_above[:, :, -halo:], x_l, from_below[:, :, :halo]], axis=2)
        first = jnp.concatenate([x_l, from_below], axis=2)
        last = jnp.concatenate([from_above, x_l], axis=2)
        padded = jnp.where(idx == 0, first,
                           jnp.where(idx == n - 1, last, interior))
        out = denoise_fn(padded)
        start = jnp.where(idx == 0, 0, jnp.where(idx == n - 1, 2 * halo, halo))
        return jax.lax.dynamic_slice_in_dim(out, start, x_l.shape[2], axis=2)

    spec = P(batch_axis, None, axis, None)
    fn = shard_map(body, mesh=mesh, in_specs=spec, out_specs=spec)
    return fn(x)
