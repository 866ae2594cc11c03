"""TV denoising iterations (dual ascent), jit-friendly lax.fori_loop.

Counterpart of
/root/reference/dprox/proxfn/pnp/denoisers/models/TV_denoising.py. Works
on [H,W,B]-shaped stacks like the reference (B = channel/band axis).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _clip(x, t):
    return jnp.clip(x, -t, t)


def _dh(x):
    return x[:, 1:, :] - x[:, :-1, :]


def _dv(x):
    return x[1:, :, :] - x[:-1, :, :]


def _dt(x):
    return x[:, :, 1:] - x[:, :, :-1]


def _dht(z):
    return jnp.concatenate([-z[:, :1, :], z[:, :-1, :] - z[:, 1:, :], z[:, -1:, :]], 1)


def _dvt(z):
    return jnp.concatenate([-z[:1, :, :], z[:-1, :, :] - z[1:, :, :], z[-1:, :, :]], 0)


def _dtt(z):
    return jnp.concatenate([-z[:, :, :1], z[:, :, :-1] - z[:, :, 1:], z[:, :, -1:]], 2)


def tv_denoising(y0, lam, iterations: int = 100):
    """2-D TV (per band) on [H,W,B] (reference: TV_denoising.py:4-16)."""
    h, w, b = y0.shape
    alpha = 5.0

    def body(i, carry):
        zh, zv, x0 = carry
        x0h = y0 - _dht(zh)
        x0v = y0 - _dvt(zv)
        x0 = (x0h + x0v) / 2.0
        zh = _clip(zh + (1.0 / alpha) * _dh(x0), lam / 2.0)
        zv = _clip(zv + (1.0 / alpha) * _dv(x0), lam / 2.0)
        return zh, zv, x0

    # derive the dual inits from y0 (not fresh jnp.zeros constants) so
    # they inherit y0's varying manual axes under shard_map — a constant
    # init makes the fori_loop carry type mismatch its output when the
    # denoiser runs inside a sharded solve (found by the tutorial test)
    zh = jnp.zeros_like(y0[:, 1:, :])
    zv = jnp.zeros_like(y0[1:, :, :])
    _, _, x0 = jax.lax.fori_loop(0, iterations, body, (zh, zv, y0))
    return x0


def tv_denoising3d(y0, lam, iterations: int = 100):
    """3-D TV with a band-difference term (reference: TV_denoising.py:18-34)."""
    h, w, b = y0.shape
    alpha = 5.0

    def body(i, carry):
        zh, zv, zt, x0 = carry
        x0h = y0 - _dht(zh)
        x0v = y0 - _dvt(zv)
        x0t = y0 - _dtt(zt)
        x0 = (x0h + x0v + x0t) / 3.0
        zh = _clip(zh + (1.0 / alpha) * _dh(x0), lam / 2.0)
        zv = _clip(zv + (1.0 / alpha) * _dv(x0), lam / 2.0)
        zt = _clip(zt + (1.0 / alpha) * _dt(x0), lam / 2.0)
        return zh, zv, zt, x0

    # zeros_like slices: see tv_denoising — carries must inherit y0's
    # varying manual axes to run under shard_map
    zh = jnp.zeros_like(y0[:, 1:, :])
    zv = jnp.zeros_like(y0[1:, :, :])
    zt = jnp.zeros_like(y0[:, :, 1:])
    _, _, _, x0 = jax.lax.fori_loop(0, iterations, body, (zh, zv, zt, y0))
    return x0


# --------------------------------------------------------------------------- #
# TPU-layout variants: trailing spatial axes ([..., H, W]) so the lane
# dimension is W (2048 lanes at large planes) instead of the band axis
# (B=3 -> 2.3% lane utilization in the [H, W, B] layout above, measured
# ~6x off roofline at 2048^2 — benchmarks/tiled_denoise_2048.py). Same
# math; the [H, W, B] forms are kept for the shard_map paths that
# already pin their manual axes to them.
# --------------------------------------------------------------------------- #

def _dh_w(x):  # horizontal diffs along the lane axis
    return x[..., 1:] - x[..., :-1]


def _dv_w(x):
    return x[..., 1:, :] - x[..., :-1, :]


def _dht_w(z):
    return jnp.concatenate(
        [-z[..., :1], z[..., :-1] - z[..., 1:], z[..., -1:]], -1)


def _dvt_w(z):
    return jnp.concatenate(
        [-z[..., :1, :], z[..., :-1, :] - z[..., 1:, :], z[..., -1:, :]], -2)


def _db_w(x):  # band diffs (leading axis, 3-D TV)
    return x[1:] - x[:-1]


def _dbt_w(z):
    return jnp.concatenate([-z[:1], z[:-1] - z[1:], z[-1:]], 0)


def tv_denoising_chw(y0, lam, iterations: int = 100):
    """2-D TV (per band) on [B, H, W] (bands leading)."""
    alpha = 5.0

    def body(i, carry):
        zh, zv, x0 = carry
        x0h = y0 - _dht_w(zh)
        x0v = y0 - _dvt_w(zv)
        x0 = (x0h + x0v) / 2.0
        zh = _clip(zh + (1.0 / alpha) * _dh_w(x0), lam / 2.0)
        zv = _clip(zv + (1.0 / alpha) * _dv_w(x0), lam / 2.0)
        return zh, zv, x0

    zh = jnp.zeros_like(y0[..., 1:])
    zv = jnp.zeros_like(y0[..., 1:, :])
    _, _, x0 = jax.lax.fori_loop(0, iterations, body, (zh, zv, y0))
    return x0


def tv_denoising3d_chw(y0, lam, iterations: int = 100):
    """3-D TV with a band-difference term on [B, H, W]."""
    alpha = 5.0

    def body(i, carry):
        zh, zv, zt, x0 = carry
        x0h = y0 - _dht_w(zh)
        x0v = y0 - _dvt_w(zv)
        x0t = y0 - _dbt_w(zt)
        x0 = (x0h + x0v + x0t) / 3.0
        zh = _clip(zh + (1.0 / alpha) * _dh_w(x0), lam / 2.0)
        zv = _clip(zv + (1.0 / alpha) * _dv_w(x0), lam / 2.0)
        zt = _clip(zt + (1.0 / alpha) * _db_w(x0), lam / 2.0)
        return zh, zv, zt, x0

    zh = jnp.zeros_like(y0[..., 1:])
    zv = jnp.zeros_like(y0[..., 1:, :])
    zt = jnp.zeros_like(y0[1:])
    _, _, _, x0 = jax.lax.fori_loop(0, iterations, body,
                                    (zh, zv, zt, y0))
    return x0
