"""DGUNet-style proximal network for unrolled solvers (flax.linen, NHWC).

Counterpart of /root/reference/dprox/proxfn/unrolling/dgu.py: a
multi-stage UNet whose prox step is indexed by the unrolling depth —
stage 0 runs a first-stage encoder/decoder, middle stages run a
cross-stage-feature-fusion (CSFF) block conditioned on the previous
stage's features, and the final stage is a shallow tail. The reference
threads cross-stage context through module attributes (dgu.py:313-334);
here the context is an explicit carry pytree so the whole unrolled
solver stays pure/jittable.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _conv(feats, k=3, bias=False, stride=1):
    return nn.Conv(feats, (k, k), strides=(stride, stride), padding=k // 2,
                   use_bias=bias)


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, a * x)


class CALayer(nn.Module):
    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(self.channel // self.reduction, (1, 1), use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channel, (1, 1), use_bias=False)(y)
        return x * jax.nn.sigmoid(y)


class CAB(nn.Module):
    n_feat: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        r = _conv(self.n_feat, bias=False)(x)
        r = PReLU()(r)
        r = _conv(self.n_feat, bias=False)(r)
        r = CALayer(self.n_feat, self.reduction)(r)
        return x + r


class SAM(nn.Module):
    """Supervised attention module (reference: dgu.py:93-104)."""

    n_feat: int

    @nn.compact
    def __call__(self, x, x_img):
        x1 = nn.Conv(self.n_feat, (1, 1), use_bias=False)(x)
        # zero-init the image branch so each stage's image output starts
        # at x_img exactly: the untrained unrolled solver is then stable
        # (identity-like) instead of amplifying random features per stage;
        # shape-compatible with reference checkpoints (dgu.py:93-104)
        img = nn.Conv(3, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.zeros)(x) + x_img
        return x1 + x, img


class HINBlock(nn.Module):
    """UNetConvBlock with half-instance-norm (reference: dgu.py:161-205)."""

    out_size: int
    downsample: bool
    use_csff: bool = False

    @nn.compact
    def __call__(self, x, enc=None, dec=None):
        out = nn.Conv(self.out_size, (3, 3), padding=1, use_bias=True)(x)
        half = self.out_size // 2
        o1, o2 = out[..., :half], out[..., half:]
        # instance norm (affine) on the first half
        mu = jnp.mean(o1, axis=(1, 2), keepdims=True)
        var = jnp.var(o1, axis=(1, 2), keepdims=True)
        gamma = self.param("in_gamma", nn.initializers.ones, (half,))
        beta = self.param("in_beta", nn.initializers.zeros, (half,))
        o1 = (o1 - mu) / jnp.sqrt(var + 1e-5) * gamma + beta
        out = jnp.concatenate([o1, o2], axis=-1)
        out = nn.leaky_relu(out, 0.2)
        out = nn.leaky_relu(nn.Conv(self.out_size, (3, 3), padding=1)(out), 0.2)
        out = out + nn.Conv(self.out_size, (1, 1))(x)
        if enc is not None and dec is not None:
            skip = nn.leaky_relu(
                nn.Conv(self.out_size, (3, 3), padding=1)(enc)
                + nn.Conv(self.out_size, (3, 3), padding=1)(dec), 0.1)
            phi = nn.Conv(self.out_size, (3, 3), padding=1)(skip)
            gam = nn.Conv(self.out_size, (3, 3), padding=1)(skip)
            out = out * jax.nn.sigmoid(phi) + gam + out
        if self.downsample:
            down = nn.Conv(self.out_size, (4, 4), strides=(2, 2), padding=1,
                           use_bias=False)(out)
            return down, out
        return out


class Encoder(nn.Module):
    n_feat: int
    scale: int
    depth: int = 4
    csff: bool = False

    @nn.compact
    def __call__(self, x, encoder_outs=None, decoder_outs=None):
        res = []
        for i in range(self.depth - 1):
            blk = HINBlock(self.n_feat + self.scale * (i + 1), True, self.csff)
            if encoder_outs is not None and decoder_outs is not None:
                x, x_up = blk(x, encoder_outs[i], decoder_outs[-i - 1])
            else:
                x, x_up = blk(x)
            res.append(x_up)
        x = HINBlock(self.n_feat + self.scale * (self.depth - 1), False,
                     self.csff)(x)
        return res, x


class Decoder(nn.Module):
    n_feat: int
    scale: int
    depth: int = 4

    @nn.compact
    def __call__(self, x, bridges):
        res = []
        for i in range(self.depth - 1):
            out_size = self.n_feat + self.scale * (self.depth - i - 2)
            up = nn.ConvTranspose(out_size, (2, 2), strides=(2, 2), use_bias=True)(x)
            skip = nn.Conv(out_size, (3, 3), padding=1)(bridges[-i - 1])
            x = HINBlock(out_size, False)(jnp.concatenate([up, skip], -1))
            res.append(x)
        return res


class MergeBlock(nn.Module):
    """Subspace-projection merge (reference: dgu.py:106-130)."""

    n_feat: int
    subspace_dim: int = 16

    @nn.compact
    def __call__(self, x, bridge):
        out = jnp.concatenate([x, bridge], -1)
        b, h, w, c = bridge.shape
        sub = nn.Conv(self.subspace_dim, (3, 3), padding=1, use_bias=True)(out)
        V_t = sub.reshape(b, h * w, self.subspace_dim).transpose(0, 2, 1)
        V_t = V_t / (1e-6 + jnp.abs(V_t).sum(axis=2, keepdims=True))
        V = V_t.transpose(0, 2, 1)
        mat = V_t @ V
        mat_inv = jnp.linalg.inv(mat)
        project_mat = mat_inv @ V_t
        bridge_flat = bridge.reshape(b, h * w, c)
        proj = project_mat @ bridge_flat
        bridge_new = (V @ proj).reshape(b, h, w, c)
        out = jnp.concatenate([x, bridge_new], -1)
        out = nn.Conv(self.n_feat, (3, 3), padding=1, use_bias=True)(out)
        return out + x


class DGUDenoiser(nn.Module):
    """Step-indexed proximal network with explicit carry.

    Call with method= one of first/middle/last:
      first(v)                -> (x, carry)
      middle(v, carry)        -> (x, carry)
      last(v, carry)          -> x
    carry = (feats, res, samfeats) from the previous stage.
    """

    n_feat: int = 40
    scale_unetfeats: int = 20
    scale_orsnetfeats: int = 16
    reduction: int = 4

    def setup(self):
        nf = self.n_feat
        self.shallow1 = [_conv(nf, bias=False), CAB(nf, self.reduction)]
        self.enc1 = Encoder(nf, self.scale_unetfeats, depth=4, csff=False)
        self.dec1 = Decoder(nf, self.scale_unetfeats, depth=4)
        self.sam12 = SAM(nf)
        # middle (shared basic block)
        self.shallow2 = [_conv(nf, bias=False), CAB(nf, self.reduction)]
        self.merge12 = MergeBlock(nf)
        self.enc2 = Encoder(nf, self.scale_unetfeats, depth=4, csff=True)
        self.dec2 = Decoder(nf, self.scale_unetfeats, depth=4)
        self.sam23 = SAM(nf)
        # tail
        self.shallow7 = [_conv(nf, bias=False), CAB(nf, self.reduction)]
        self.concat67 = _conv(nf + self.scale_orsnetfeats, bias=False)
        # zero-init: the untrained final stage outputs 0 instead of a
        # random-conv image of (potentially large) accumulated features —
        # keeps the untrained unrolled pipeline bounded; shape-compatible
        # with reference checkpoints (dgu.py:311)
        self.tail = nn.Conv(3, (3, 3), padding=1, use_bias=False,
                            kernel_init=nn.initializers.zeros)

    def _shallow(self, layers, v):
        x = layers[0](v)
        return layers[1](x)

    def first(self, v):
        x1 = self._shallow(self.shallow1, v)
        feat1, fin1 = self.enc1(x1)
        res1 = self.dec1(fin1, feat1)
        samfeats, x = self.sam12(res1[-1], v)
        return x, (feat1, res1, samfeats)

    def middle(self, v, carry):
        feat1, res1, samfeats = carry
        x2 = self._shallow(self.shallow2, v)
        x2 = self.merge12(x2, samfeats)
        feat2, fin2 = self.enc2(x2, feat1, res1)
        res2 = self.dec2(fin2, feat2)
        samfeats2, x = self.sam23(res2[-1], v)
        return x, (feat2, res2, samfeats2)

    def last(self, v, carry):
        _, _, samfeats = carry
        x7 = self._shallow(self.shallow7, v)
        x7 = self.concat67(jnp.concatenate([x7, samfeats], -1))
        return self.tail(x7)

    def __call__(self, v):
        # init path: exercise all three stages so every param exists
        x, carry = self.first(v)
        x, carry = self.middle(x, carry)
        return self.last(x, carry)
