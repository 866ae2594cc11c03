"""FFDNet denoiser (Zhang et al., TIP 2018) in flax.linen, NHWC.

Counterpart of
/root/reference/dprox/proxfn/pnp/denoisers/models/network_ffdnet.py:27-69:
pixel-unshuffle (sf=2) -> concat noise-level map -> nb conv(+ReLU) stack
-> pixel-shuffle, with replication padding for odd sizes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import Conv, pixel_shuffle, pixel_unshuffle, replication_pad_to_even


class FFDNet(nn.Module):
    in_nc: int = 1
    out_nc: int = 1
    nc: int = 64
    nb: int = 15
    # residual=True predicts the NOISE and returns input - residual, so
    # sigma->0 degenerates to identity (critical for late PnP iterations,
    # where a direct-prediction net caps reconstruction quality at its
    # own low-sigma fidelity). The reference architecture and its
    # checkpoints predict the image directly (network_ffdnet.py:27-69),
    # so False stays the torch-checkpoint-compatible default; the
    # in-repo-trained priors use True.
    residual: bool = False

    @nn.compact
    def __call__(self, x, sigma):
        """x: [N,H,W,C]; sigma: scalar or [N] / [N,1,1,1] noise level."""
        x_in = x
        x, h, w = replication_pad_to_even(x, 2)
        x = pixel_unshuffle(x, 2)
        sigma = jnp.asarray(sigma, x.dtype)
        sigma = sigma.reshape((-1,) + (1,) * 3)  # [N or 1, 1,1,1]
        m = jnp.ones_like(x[..., :1]) * sigma
        x = jnp.concatenate([x, m], axis=-1)
        x = Conv(self.nc, act="relu")(x)
        for _ in range(self.nb - 2):
            x = Conv(self.nc, act="relu")(x)
        x = Conv(self.out_nc * 4)(x)
        x = pixel_shuffle(x, 2)
        x = x[:, :h, :w, :]
        return x_in - x if self.residual else x


def fused_apply(module: FFDNet, params, x, sigma):
    """Boundary-fused FFDNet forward — same function as
    ``module.apply(params, x, sigma)`` with the pixel-(un)shuffle
    relayouts absorbed into the first/last convolutions.

    Why: on TPU the 6-D transposes behind pixel_unshuffle/pixel_shuffle
    compile to layout-change copies whose tiny minor dims (C, 2, 2) hit
    a pathological copy emitter — measured 2x 9.6 ms for 25 MB at
    2048^2 on v5e, i.e. ~half the whole denoiser call (HLO
    estimated_cycles attribution, benchmarks/fused_boundary_ab.py).
    Instead:

    * first conv: a 3x3 conv on the space-to-depth input (+ constant
      noise-map channel) is EXACTLY a 6x6 stride-2 conv on the full-res
      ``[x, sigma_map]`` tensor — ``W6[2di+dy, 2dj+dx, c] =
      K1[di, dj, c*4 + dy*2 + dx]`` with the sigma tap placed at the
      (dy, dx) = (0, 0) sub-offset (the sigma map is spatially
      constant, and zero-padding validity coincides at both scales).
      The 6x6 stride-2 form is then refactored once more into a
      POLYPHASE 3x3 conv (see inline comment) because cin=4 lane-pads
      to 128 on the MXU — the row-deinterleave + minor-reshape fold
      raises true cin to 16 with zero intra-row data movement,
      3.1x on the layer at 2048^2 (benchmarks/first_conv_probe.py);
    * last conv + depth-to-space: the four (dy, dx) phase maps are
      interior-padded (dilated) and summed — a pure-zero-overlap
      scatter that XLA emits as cheap pads + adds.

    The rearrangement is algebraically exact (CPU f32 agreement ~1e-6,
    tests/test_models.py); on TPU the different conv emitter gives
    rounding-level differences of the backend's default bf16 conv
    precision. Measured marginal denoiser cost on v5e (f32, nc=96
    nb=10): 1.95 -> 1.37 ms at 512^2, 8.27 -> 5.98 ms at 1024^2,
    40.4 -> 27.3 ms at 2048^2 (-28..-32% at every size, so the path is
    not size-gated). Gradients flow through the weight rearrangement
    (pure indexing). No reference counterpart (the torch reference
    pays cuDNN's fused shuffle, network_ffdnet.py:27-69).
    """
    in_nc, out_nc, nc, nb = module.in_nc, module.out_nc, module.nc, module.nb
    x_in = x
    x, h, w = replication_pad_to_even(x, 2)
    sigma = jnp.asarray(sigma, x.dtype).reshape((-1,) + (1,) * 3)
    layers = [params["params"][f"Conv_{i}"]["Conv_0"] for i in range(nb)]

    K1, b1 = layers[0]["kernel"], layers[0]["bias"]  # [3,3,in_nc*4+1,nc]
    Kd = K1[:, :, : in_nc * 4, :].reshape(3, 3, in_nc, 2, 2, nc)
    Kd = jnp.transpose(Kd, (0, 3, 1, 4, 2, 5)).reshape(6, 6, in_nc, nc)
    Ks = jnp.zeros((3, 2, 3, 2, nc), K1.dtype)
    Ks = Ks.at[:, 0, :, 0].set(K1[:, :, in_nc * 4, :]).reshape(6, 6, 1, nc)
    W6 = jnp.concatenate([Kd, Ks], axis=2)  # 6x6 stride-2 equivalent

    # The 6x6 stride-2 cin=4 conv itself runs AT the MXU roofline but
    # lane-pads cin 4->128, burning 97% of it (measured 5.5 ms at
    # 2048^2, ~5.3 true TFLOP/s). Polyphase fix with NO intra-row data
    # movement: channels-last space-to-depth is a row-deinterleave plus
    # a free minor-dim reshape (a row (W, cf) viewed as (W/2, 2*cf) IS
    # the column-polyphase layout), and the channel permutation is
    # absorbed into the weights. One 3x3 cin=4*cf conv on the folded
    # half-res tensor is algebraically identical to the 6x6 stride-2
    # conv (full-res zero pad 2 == half-res zero pad 1 in every phase).
    # Measured (benchmarks/first_conv_probe.py, v5e): 7.1->2.3 ms at
    # 2048^2, 2.1->1.2 at 1024^2, tie at 512^2 — not size-gated.
    cf = in_nc + 1
    W16 = jnp.transpose(W6.reshape(3, 2, 3, 2, cf, nc),
                        (0, 2, 1, 3, 4, 5)).reshape(3, 3, 4 * cf, nc)

    m = jnp.ones_like(x[..., :1]) * sigma
    xm = jnp.concatenate([x, m], axis=-1)
    n_, hh, ww, _ = xm.shape
    ev = xm[:, 0::2].reshape(n_, hh // 2, ww // 2, 2 * cf)
    od = xm[:, 1::2].reshape(n_, hh // 2, ww // 2, 2 * cf)
    z = jnp.concatenate([ev, od], axis=-1)
    y = jax.lax.conv_general_dilated(
        z, W16, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
    y = jnp.maximum(y, 0.0)

    for l in layers[1:-1]:
        y = jax.lax.conv_general_dilated(
            y, l["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + l["bias"]
        y = jnp.maximum(y, 0.0)

    y = jax.lax.conv_general_dilated(
        y, layers[-1]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + layers[-1]["bias"]
    out = None
    zero = jnp.zeros((), y.dtype)
    for dy in range(2):
        for dx in range(2):
            o = y[..., [c * 4 + dy * 2 + dx for c in range(out_nc)]]
            o = jax.lax.pad(o, zero, [(0, 0, 0), (dy, 1 - dy, 1),
                                      (dx, 1 - dx, 1), (0, 0, 0)])
            out = o if out is None else out + o
    out = out[:, :h, :w, :]
    return x_in - out if module.residual else out


class FFDNet3D(nn.Module):
    """Variant with the sigma map concatenated by the caller
    (reference: network_ffdnet.py:72-113)."""

    in_nc: int = 32
    out_nc: int = 31
    nc: int = 64
    nb: int = 15

    @nn.compact
    def __call__(self, x):
        x, h, w = replication_pad_to_even(x, 2)
        x = pixel_unshuffle(x, 2)
        x = Conv(self.nc, act="relu")(x)
        for _ in range(self.nb - 2):
            x = Conv(self.nc, act="relu")(x)
        x = Conv(self.out_nc * 4)(x)
        x = pixel_shuffle(x, 2)
        return x[:, :h, :w, :]
