"""DGUNet-style proximal network for unrolled solvers (flax.linen, NHWC).

Counterpart of /root/reference/dprox/proxfn/unrolling/dgu.py: a
multi-stage UNet whose prox step is indexed by the unrolling depth —
stage 0 runs a first-stage encoder/decoder, middle stages run a
cross-stage-feature-fusion (CSFF) block conditioned on the previous
stage's features, and the final stage is a shallow tail. The reference
threads cross-stage context through module attributes (dgu.py:313-334);
here the context is an explicit carry pytree so the whole unrolled
solver stays pure/jittable.

Submodules carry explicit names mirroring the torch attribute names so
checkpoint conversion (:func:`convert_dgu`) is a pure key rewrite
instead of fragile positional matching.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def _conv(feats, k=3, bias=False, stride=1, name=None):
    return nn.Conv(feats, (k, k), strides=(stride, stride), padding=k // 2,
                   use_bias=bias, name=name)


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
        y = nn.Conv(self.channel // self.reduction, (1, 1), use_bias=False,
                    name="conv_du_0")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channel, (1, 1), use_bias=False, name="conv_du_2")(y)
        return x * jax.nn.sigmoid(y)


class CAB(nn.Module):
    n_feat: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        r = _conv(self.n_feat, bias=False, name="body_0")(x)
        r = PReLU(name="prelu")(r)
        r = _conv(self.n_feat, bias=False, name="body_2")(r)
        r = CALayer(self.n_feat, self.reduction, name="CA")(r)
        return x + r


class SAM(nn.Module):
    """Supervised attention module (reference: dgu.py:93-104)."""

    n_feat: int

    @nn.compact
    def __call__(self, x, x_img):
        x1 = nn.Conv(self.n_feat, (1, 1), use_bias=False, name="conv1")(x)
        # zero-init the image branch so each stage's image output starts
        # at x_img exactly: the untrained unrolled solver is then stable
        # (identity-like) instead of amplifying random features per stage;
        # shape-compatible with reference checkpoints (dgu.py:93-104)
        img = nn.Conv(3, (1, 1), use_bias=False, name="conv2",
                      kernel_init=nn.initializers.zeros)(x) + x_img
        return x1 + x, img


class HINBlock(nn.Module):
    """UNetConvBlock (reference: dgu.py:161-205). ``use_hin`` applies
    half-instance-norm — True in the encoder path, False in the decoder
    (reference UNetUpBlock builds its conv_block with use_HIN unset,
    dgu.py:212)."""

    out_size: int
    downsample: bool
    use_csff: bool = False
    use_hin: bool = True

    @nn.compact
    def __call__(self, x, enc=None, dec=None):
        out = nn.Conv(self.out_size, (3, 3), padding=1, use_bias=True,
                      name="conv_1")(x)
        if self.use_hin:
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
        out = nn.leaky_relu(
            nn.Conv(self.out_size, (3, 3), padding=1, name="conv_2")(out), 0.2)
        out = out + nn.Conv(self.out_size, (1, 1), name="identity")(x)
        if enc is not None and dec is not None:
            skip = nn.leaky_relu(
                nn.Conv(self.out_size, (3, 3), padding=1, name="csff_enc")(enc)
                + nn.Conv(self.out_size, (3, 3), padding=1,
                          name="csff_dec")(dec), 0.1)
            phi = nn.Conv(self.out_size, (3, 3), padding=1, name="phi")(skip)
            gam = nn.Conv(self.out_size, (3, 3), padding=1, name="gamma")(skip)
            out = out * jax.nn.sigmoid(phi) + gam + out
        if self.downsample:
            down = nn.Conv(self.out_size, (4, 4), strides=(2, 2), padding=1,
                           use_bias=False, name="downsample")(out)
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
            blk = HINBlock(self.n_feat + self.scale * (i + 1), True,
                           self.csff, name=f"body_{i}")
            if encoder_outs is not None and decoder_outs is not None:
                x, x_up = blk(x, encoder_outs[i], decoder_outs[-i - 1])
            else:
                x, x_up = blk(x)
            res.append(x_up)
        x = HINBlock(self.n_feat + self.scale * (self.depth - 1), False,
                     self.csff, name=f"body_{self.depth - 1}")(x)
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
            up = nn.ConvTranspose(out_size, (2, 2), strides=(2, 2),
                                  use_bias=True, name=f"up_{i}")(x)
            skip = nn.Conv(out_size, (3, 3), padding=1,
                           name=f"skip_conv_{i}")(bridges[-i - 1])
            # decoder conv blocks have NO half-instance-norm upstream
            x = HINBlock(out_size, False, use_hin=False,
                         name=f"conv_block_{i}")(
                jnp.concatenate([up, skip], -1))
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
        sub = nn.Conv(self.subspace_dim, (3, 3), padding=1, use_bias=True,
                      name="subnet")(out)
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
        out = nn.Conv(self.n_feat, (3, 3), padding=1, use_bias=True,
                      name="conv_block")(out)
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
        self.shallow1 = [_conv(nf, bias=False, name="shallow1_0"),
                         CAB(nf, self.reduction, name="shallow1_1")]
        self.enc1 = Encoder(nf, self.scale_unetfeats, depth=4, csff=False,
                            name="enc1")
        self.dec1 = Decoder(nf, self.scale_unetfeats, depth=4, name="dec1")
        self.sam12 = SAM(nf)
        # middle (shared basic block)
        self.shallow2 = [_conv(nf, bias=False, name="shallow2_0"),
                         CAB(nf, self.reduction, name="shallow2_1")]
        self.merge12 = MergeBlock(nf)
        self.enc2 = Encoder(nf, self.scale_unetfeats, depth=4, csff=True,
                            name="enc2")
        self.dec2 = Decoder(nf, self.scale_unetfeats, depth=4, name="dec2")
        self.sam23 = SAM(nf)
        # tail
        self.shallow7 = [_conv(nf, bias=False, name="shallow7_0"),
                         CAB(nf, self.reduction, name="shallow7_1")]
        self.concat67 = _conv(nf + self.scale_orsnetfeats, bias=False,
                              name="concat67")
        # zero-init: the untrained final stage outputs 0 instead of a
        # random-conv image of (potentially large) accumulated features —
        # keeps the untrained unrolled pipeline bounded; shape-compatible
        # with reference checkpoints (dgu.py:311)
        self.tail = nn.Conv(3, (3, 3), padding=1, use_bias=False,
                            kernel_init=nn.initializers.zeros, name="tail")

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


# ---------------------------------------------------------------------------
# torch checkpoint conversion (name-based)
# ---------------------------------------------------------------------------

# torch attribute path prefix -> flax top-level param key
# (reference dgu.py:300-311 Denoiser.__init__ + :275-283 Basic_block;
# basic.concat12 exists upstream but is never used in prox, dgu.py:289)
_DGU_TOP = {
    "shallow_feat1.0": ("shallow1_0",),
    "shallow_feat1.1": ("shallow1_1",),
    "stage1_encoder": ("enc1",),
    "stage1_decoder": ("dec1",),
    "sam12": ("sam12",),
    "basic.shallow_feat2.0": ("shallow2_0",),
    "basic.shallow_feat2.1": ("shallow2_1",),
    "basic.merge12": ("merge12",),
    "basic.stage2_encoder": ("enc2",),
    "basic.stage2_decoder": ("dec2",),
    "basic.sam23": ("sam23",),
    "shallow_feat7.0": ("shallow7_0",),
    "shallow_feat7.1": ("shallow7_1",),
    "concat67": ("concat67",),
    "tail": ("tail",),
}


def _dgu_rewrite_key(key: str) -> Optional[Tuple[str, ...]]:
    """Rewrite one torch state_dict key into a flax param path (tuple),
    or None for keys with no flax counterpart (unused basic.concat12)."""
    for tp, fp in _DGU_TOP.items():
        if key.startswith(tp + "."):
            rest = key[len(tp) + 1:]
            break
    else:
        return None
    # CAB Sequential: body.0 conv, body.1 the (shared) PReLU act, body.2
    # conv (reference dgu.py:55-61)
    if rest == "body.1.weight":
        return fp + ("prelu", "alpha")
    parts = rest.split(".")
    out = list(fp)
    i = 0
    while i < len(parts) - 1:
        p = parts[i]
        if p in ("body", "skip_conv") and parts[i + 1].isdigit():
            nxt = parts[i + 1]
            # decoder body.N.{up,conv_block} flatten to up_N/conv_block_N
            if i + 2 < len(parts) and parts[i + 2] in ("up", "conv_block"):
                out.append(f"{parts[i + 2]}_{nxt}")
                i += 3
            else:
                out.append(f"{p}_{nxt}")
                i += 2
            continue
        if p == "conv_du" and parts[i + 1].isdigit():
            out.append(f"conv_du_{parts[i + 1]}")
            i += 2
            continue
        if p == "norm":
            # InstanceNorm2d affine -> in_gamma / in_beta params
            leaf = parts[i + 1]
            out.append({"weight": "in_gamma", "bias": "in_beta"}[leaf])
            return tuple(out)
        if p == "CA":
            out.append("CA")
            i += 1
            continue
        out.append(p)
        i += 1
    leaf = parts[-1]
    out.append({"weight": "kernel", "bias": "bias"}[leaf])
    return tuple(out)


def convert_dgu(sd, flax_params):
    """Name-based torch->flax conversion for the DGU denoiser
    (reference proxfn/unrolling/dgu.py Denoiser). Unlike the positional
    zoo converter, torch registration order differs from flax creation
    order here, and 1-d params (PReLU slopes, InstanceNorm affines) must
    land on specific leaves — so keys are rewritten individually."""
    def _copy(d):
        return {k: _copy(v) for k, v in d.items()} if isinstance(d, dict) else d

    params = _copy(flax_params)
    root = params["params"] if "params" in params else params
    filled = 0
    for k, v in sd.items():
        path = _dgu_rewrite_key(k)
        if path is None:
            continue
        node = root
        for p in path[:-1]:
            if p not in node:
                raise KeyError(f"{k} -> {path}: missing {p!r} in flax tree "
                               f"(have {list(node)[:8]})")
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            raise KeyError(f"{k} -> {path}: missing leaf {leaf!r}")
        cur = node[leaf]
        w = np.asarray(v)
        if leaf == "kernel":
            if "up_" in path[-2]:
                # ConvTranspose2d IOHW -> flax HWIO with spatial flip
                w = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
            else:
                w = np.transpose(w, (2, 3, 1, 0))
        if w.shape != cur.shape:
            raise ValueError(f"{k} -> {path}: shape {w.shape} vs {cur.shape}")
        node[leaf] = jnp.asarray(np.ascontiguousarray(w))
        filled += 1
    return params
