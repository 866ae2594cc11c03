"""Denoiser wrappers: uniform ``denoise(x, sigma)`` over the model zoo.

Counterpart of /root/reference/dprox/proxfn/pnp/denoisers/{base,wrapper,
composite}.py. Wrappers hold a flax module + param pytree and run NCHW ->
NHWC -> NCHW at the boundary (TPU conv layouts are NHWC-native). Param
pytrees can be overridden per call so training paths thread gradients
through explicit arguments instead of mutable module state.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...models import (DnCNN, FFDNet, FFDNet3D, IRCNN, UNet, UNetRes,
                       load_torch_state_dict, torch_to_flax, tv_denoising,
                       tv_denoising3d)

Array = jnp.ndarray


def _nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def _ffdnet_forward(module, params, x_nhwc, sigma):
    """FFDNet forward with the boundary-fused path on TPU.

    ``models.ffdnet.fused_apply`` absorbs the pixel-(un)shuffle
    relayouts into the first/last convs — measured -28..-32% per
    denoiser call on v5e at 512^2..2048^2 (models/ffdnet.py docstring).
    Same function; TPU-only by default because the win comes from the
    TPU copy emitter's 6-D-transpose pathology (CPU prefers the plain
    path). DPROX_FFDNET_FUSED=1/0 forces it on/off for A/B and tests.
    """
    import os

    flag = os.environ.get("DPROX_FFDNET_FUSED", "")
    if flag == "1" or (flag != "0"
                       and jax.default_backend() in ("tpu", "axon")):
        from ...models.ffdnet import fused_apply

        return fused_apply(module, params, x_nhwc, jnp.asarray(sigma))
    return module.apply(params, x_nhwc, jnp.asarray(sigma))


def _tv_pallas_enabled():
    """Fused-TV kernel gate: on for TPU backends, DPROX_TV_PALLAS=1/0
    forces (the kernel itself falls back off-TPU unless forced)."""
    import os

    flag = os.environ.get("DPROX_TV_PALLAS", "")
    if flag == "0":
        return False
    return flag == "1" or jax.default_backend() in ("tpu", "axon")


class Denoiser:
    """Base wrapper (reference: denoisers/base.py:5-18)."""

    module = None
    #: spatial receptive-field radius in input pixels (None = unknown /
    #: unbounded); used to derive the halo for sharded inference
    receptive_radius = None

    def __init__(self, params=None):
        self.params = params
        self.pretrained = params is not None

    def _load_ckpt(self, path: str, init):
        """Shared checkpoint dispatch: flax msgpack or torch state dict."""
        if path.endswith(".msgpack"):
            from flax import serialization

            with open(path, "rb") as f:
                return serialization.from_bytes(init, f.read())
        return torch_to_flax(load_torch_state_dict(path), init)

    def init_params(self, sample_shape, key=0):
        raise NotImplementedError

    def denoise(self, x: Array, sigma, params=None) -> Array:
        """x: [B,C,H,W]; sigma: scalar/[B]; returns [B,C,H,W]."""
        raise NotImplementedError

    def __call__(self, x, sigma, params=None):
        return self.denoise(x, sigma, params)


class Denoiser2D(Denoiser):
    """Grayscale model applied per band — vectorized by folding the
    channel axis into the batch (reference loops bands: base.py:21-25)."""

    def denoise(self, x, sigma, params=None):
        B, C, H, W = x.shape
        flat = x.reshape(B * C, 1, H, W)
        out = self._denoise_gray(flat, sigma, params)
        return out.reshape(B, C, H, W)


class FFDNetDenoiser(Denoiser2D):
    """(reference: wrapper.py:25-35)"""

    def __init__(self, params=None, ckpt_path: Optional[str] = None,
                 nc: int = 64, nb: int = 15, residual: bool = False):
        self.module = FFDNet(in_nc=1, out_nc=1, nc=nc, nb=nb,
                             residual=residual)
        # nb 3x3 layers at half resolution (pixel-unshuffle sf=2)
        self.receptive_radius = 2 * nb
        if params is None and ckpt_path is not None:
            params = self._load(ckpt_path)
        if params is None:
            params = self.module.init(jax.random.key(0),
                                      jnp.zeros((1, 32, 32, 1)), jnp.zeros(()))
            super().__init__(None)
            self.params = params
            return
        super().__init__(params)

    def _load(self, path):
        init = self.module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)),
                                jnp.zeros(()))
        return self._load_ckpt(path, init)

    def _denoise_gray(self, x, sigma, params=None):
        p = params if params is not None else self.params
        out = _ffdnet_forward(self.module, p, _nchw_to_nhwc(x), sigma)
        return _nhwc_to_nchw(out)


class FFDNetColorDenoiser(Denoiser):
    """(reference: wrapper.py:38-48)"""

    def __init__(self, params=None, ckpt_path: Optional[str] = None,
                 nc: int = 96, nb: int = 12, residual: bool = False):
        self.module = FFDNet(in_nc=3, out_nc=3, nc=nc, nb=nb,
                             residual=residual)
        self.receptive_radius = 2 * nb
        init = self.module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                                jnp.zeros(()))
        if params is None and ckpt_path is not None:
            params = self._load_ckpt(ckpt_path, init)
        super().__init__(params if params is not None else None)
        if self.params is None:
            self.params = init

    def denoise(self, x, sigma, params=None):
        p = params if params is not None else self.params
        out = _ffdnet_forward(self.module, p, _nchw_to_nhwc(x), sigma)
        return _nhwc_to_nchw(out)


class FFDNet3DDenoiser(Denoiser):
    """Hyperspectral FFDNet: caller-concatenated sigma map channel
    (reference: wrapper.py:51-64)."""

    def __init__(self, params=None, ckpt_path: Optional[str] = None,
                 in_nc: int = 32, out_nc: int = 31):
        self.module = FFDNet3D(in_nc=in_nc, out_nc=out_nc, nc=64, nb=15)
        init = self.module.init(jax.random.key(0),
                                jnp.zeros((1, 32, 32, in_nc)))
        if params is None and ckpt_path is not None:
            params = torch_to_flax(load_torch_state_dict(ckpt_path), init)
        super().__init__(params if params is not None else None)
        if self.params is None:
            self.params = init

    def denoise(self, x, sigma, params=None):
        p = params if params is not None else self.params
        sigma = jnp.asarray(sigma, x.dtype).reshape((-1, 1, 1, 1))
        smap = jnp.ones_like(x[:, :1]) * sigma
        inp = jnp.concatenate([x, smap], axis=1)
        out = self.module.apply(p, _nchw_to_nhwc(inp))
        return _nhwc_to_nchw(out)


class DRUNetDenoiser(Denoiser):
    """DRUNet with tiled ("refield") inference for large inputs
    (reference: wrapper.py:91-146)."""

    def __init__(self, n_channels=3, params=None, ckpt_path: Optional[str] = None,
                 min_size: int = 256, modulo: int = 16,
                 nc=(64, 128, 256, 512), nb: int = 4, residual: bool = False):
        self.n_channels = n_channels
        self.min_size = min_size
        self.modulo = modulo
        self.residual = residual
        self.module = UNetRes(in_nc=n_channels + 1, out_nc=n_channels,
                              nc=tuple(nc), nb=nb)
        init = self.module.init(jax.random.key(0),
                                jnp.zeros((1, 64, 64, n_channels + 1)))
        if params is None and ckpt_path is not None:
            if str(ckpt_path).endswith(".msgpack"):
                from flax import serialization

                with open(ckpt_path, "rb") as f:
                    params = serialization.from_bytes(init, f.read())
            else:
                params = torch_to_flax(load_torch_state_dict(ckpt_path), init)
        super().__init__(params if params is not None else None)
        if self.params is None:
            self.params = init

    def _apply(self, x_nhwc, params):
        # pad to multiple of `modulo` (edge), run, crop
        h, w = x_nhwc.shape[1:3]
        ph, pw = (-h) % self.modulo, (-w) % self.modulo
        if ph or pw:
            x_nhwc = jnp.pad(x_nhwc, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        out = self.module.apply(params, x_nhwc)
        if self.residual:
            # net predicts the noise; exact identity as sigma -> 0
            out = x_nhwc[..., :out.shape[-1]] - out
        return out[:, :h, :w, :]

    def denoise(self, x, sigma, params=None):
        p = params if params is not None else self.params
        sigma = jnp.asarray(sigma, x.dtype).reshape((-1, 1, 1, 1))
        smap = jnp.ones_like(x[:, :1]) * sigma
        inp = jnp.concatenate([x, smap], axis=1)
        nhwc = _nchw_to_nhwc(inp)
        h, w = nhwc.shape[1:3]
        if max(h, w) <= self.min_size:
            return _nhwc_to_nchw(self._apply(nhwc, p))
        # quadrant split with shared borders (static shapes per quadrant)
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        quads = [nhwc[:, :h2 + 8, :w2 + 8], nhwc[:, :h2 + 8, w - (w2 + 8):],
                 nhwc[:, h - (h2 + 8):, :w2 + 8], nhwc[:, h - (h2 + 8):, w - (w2 + 8):]]
        outs = [self._apply(q, p) for q in quads]
        top = jnp.concatenate([outs[0][:, :h2, :w2], outs[1][:, :h2, -(w - w2):]], axis=2)
        bot = jnp.concatenate([outs[2][:, -(h - h2):, :w2], outs[3][:, -(h - h2):, -(w - w2):]], axis=2)
        return _nhwc_to_nchw(jnp.concatenate([top, bot], axis=1))


class IRCNNDenoiser(Denoiser2D):
    """25 per-sigma weight sets, selected by a traced index via stacked
    params + dynamic indexing (the reference hot-swaps state_dicts on the
    host, wrapper.py:66-88 — not jit-compatible; stacking is)."""

    def __init__(self, n_channels=1, params_stack=None, ckpt_path: Optional[str] = None):
        self.module = IRCNN(in_nc=n_channels, out_nc=n_channels, nc=64)
        # 7 dilated conv layers, dilations 1..4..1 -> radius sum(d_i)
        self.receptive_radius = 16
        init = self.module.init(jax.random.key(0), jnp.zeros((1, 32, 32, n_channels)))
        if params_stack is None and ckpt_path is not None:
            sds = load_torch_state_dict(ckpt_path)  # dict idx -> state_dict
            import torch

            raw = torch.load(ckpt_path, map_location="cpu")
            plist = []
            for i in range(25):
                sd = {k: v.numpy() for k, v in raw[str(i)].items()}
                plist.append(torch_to_flax(sd, init))
            params_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *plist)
        self.params_stack = params_stack
        super().__init__(params_stack)
        if self.params_stack is None:
            self.params_stack = jax.tree.map(lambda x: jnp.stack([x] * 25), init)

    def _denoise_gray(self, x, sigma, params=None):
        stack = params if params is not None else self.params_stack
        sig = jnp.max(jnp.asarray(sigma))
        idx = jnp.clip(jnp.ceil(sig * 255.0 / 2.0) - 1, 0, 24).astype(jnp.int32)
        p = jax.tree.map(lambda t: t[idx], stack)
        out = self.module.apply(p, _nchw_to_nhwc(x))
        return _nhwc_to_nchw(out)


class UNetDenoiser(Denoiser2D):
    """CSMRI 'unet-nm' prior: per-band, input = concat(x, sigma map),
    residual out, clamped to [0,1] (reference: wrapper.py:205-221)."""

    def __init__(self, params=None, ckpt_path: Optional[str] = None):
        self.module = UNet(in_channels=2, out_channels=1)
        init = self.module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 2)))
        if params is None and ckpt_path is not None:
            import torch

            raw = torch.load(ckpt_path, map_location="cpu")
            sd = raw.state_dict() if hasattr(raw, "state_dict") else raw
            sd = {k: v.detach().numpy() for k, v in sd.items()}
            params = torch_to_flax(sd, init)
        super().__init__(params if params is not None else None)
        if self.params is None:
            self.params = init

    def _denoise_gray(self, x, sigma, params=None):
        p = params if params is not None else self.params
        sigma = jnp.asarray(sigma, x.dtype).reshape((-1, 1, 1, 1))
        smap = jnp.ones_like(x) * sigma
        inp = jnp.concatenate([x, smap], axis=1)
        out = self.module.apply(p, _nchw_to_nhwc(inp))
        return jnp.clip(_nhwc_to_nchw(out), 0.0, 1.0)


class TVDenoiser(Denoiser):
    """(reference: wrapper.py:8-22)"""

    def __init__(self, iter_num: int = 5, use_3dtv: bool = False):
        super().__init__(params=())
        # each TV iteration propagates information one pixel
        self.receptive_radius = iter_num + 1
        self.iter_num = iter_num
        self.use_3dtv = use_3dtv

    def denoise(self, x, sigma, params=None):
        # CHW layout: lanes along W instead of the C=3 band axis (the
        # reference-layout [H,W,C] form measured ~6x off roofline at
        # 2048^2 from 2.3% lane utilization — models/tv.py)
        from dprox_tpu.models.tv import tv_denoising3d_chw, tv_denoising_chw

        if not self.use_3dtv and _tv_pallas_enabled():
            # all iterations fused in VMEM row stripes — 5.9x at
            # 3x2048^2/it10 on v5e, identical to 6e-8 (2-D TV is
            # per-band, so batch folds into the band axis; 3-D TV
            # couples bands and keeps the jnp path)
            from ...ops.pallas_kernels import tv_denoise_chw_pallas

            B, C, H, W = x.shape
            out = tv_denoise_chw_pallas(
                x.reshape(B * C, H, W), jnp.asarray(sigma, x.dtype),
                self.iter_num)
            return out.reshape(B, C, H, W)

        fn = tv_denoising3d_chw if self.use_3dtv else tv_denoising_chw

        def one(img):  # [C,H,W]
            return fn(img, jnp.asarray(sigma, x.dtype), self.iter_num)

        return jax.vmap(one)(x)


class Augment(Denoiser):
    """Geometric self-ensemble: average over the 8 dihedral transforms.

    The reference cycles one transform per call with mutable state
    (composite.py:5-47) — stateful and jit-hostile; averaging all 8 in
    one batched pass is the pure equivalent used at inference.
    """

    def __init__(self, denoiser: Denoiser):
        self.inner = denoiser
        self.params = denoiser.params
        self.pretrained = denoiser.pretrained

    def denoise(self, x, sigma, params=None):
        # Deliberately 8 sequential calls, NOT one stacked batch-8 call:
        # measured on v5e at 512² (benchmarks/augment_ab.py) the batched
        # form is 2.5-3.4x SLOWER (tiny_ffdnet 79->31 x8-calls/s,
        # res_ffdnet 64->19) — at B=8 the per-layer activation working
        # set (8x512²xnc f32) spills VMEM and the conv chain goes
        # HBM-bound, while the B=1 chains keep activations resident.
        outs = []
        for k in range(4):
            xr = jnp.rot90(x, k, axes=(-2, -1))
            o = self.inner.denoise(xr, sigma, params)
            outs.append(jnp.rot90(o, -k, axes=(-2, -1)))
            xf = jnp.flip(xr, axis=-1)
            of = self.inner.denoise(xf, sigma, params)
            outs.append(jnp.rot90(jnp.flip(of, axis=-1), -k, axes=(-2, -1)))
        return sum(outs) / 8.0


class BF16Denoiser(Denoiser):
    """Run a wrapped denoiser's network in bfloat16 (params and
    activations), casting input/output at the boundary.

    Measured on v5e at 512² for res_ffdnet_color (nc=96): 510 -> 618
    denoiser calls/s (+21%) — that net is compute-bound at ~94% of the
    f32 MXU peak (benchmarks/roofline_pnp.py), so dropping the f32
    multi-pass penalty is pure gain; smaller lane-bound nets
    (tiny_ffdnet nc=32) see no benefit, matching round-1's negative
    result. Measured quality on the 512² hopper deconv benchmark with
    the res_ffdnet_color_tv fusion prior: 34.98 dB both f32 and bf16
    (identical to 0.01 dB) — the TV fusion and the ADMM data term keep
    the solve in f32 and wash out the denoiser's bf16 rounding. Still
    opt-in: quality cost is task-dependent at bf16's ~3 decimal digits,
    measure before shipping a pipeline on it. No reference counterpart
    (torch fp16 inference is not used by the reference wrappers,
    wrapper.py).
    """

    def __init__(self, denoiser):
        self.denoiser = denoiser
        self.params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if getattr(a, "dtype", None) == jnp.float32 else a,
            denoiser.params)
        self.pretrained = getattr(denoiser, "pretrained", False)
        r = getattr(denoiser, "receptive_radius", None)
        if r is not None:
            self.receptive_radius = r

    def denoise(self, x, sigma, params=None):
        p = params if params is not None else self.params
        out = self.denoiser.denoise(x.astype(jnp.bfloat16),
                                    jnp.asarray(sigma, jnp.bfloat16),
                                    params=p)
        return out.astype(jnp.float32)


class EnsembleDenoiser(Denoiser):
    """Weighted average of several denoisers' outputs.

    Different architectures (FFDNet vs DRUNet) keep decorrelated
    residual errors, so averaging them denoises better than either
    alone at the same per-net quality — a beyond-reference addition
    (the reference has no multi-denoiser composite; its Augment is a
    transform ensemble of ONE net, composite.py:5-47). Composes with
    DeepTVDenoiser and Augment.
    """

    def __init__(self, denoisers, weights=None):
        assert len(denoisers) >= 2
        self.denoisers = list(denoisers)
        if weights is None:
            weights = [1.0 / len(denoisers)] * len(denoisers)
        assert len(weights) == len(denoisers)
        self.weights = [float(w) for w in weights]
        self.params = [d.params for d in self.denoisers]
        self.pretrained = all(getattr(d, "pretrained", False)
                              for d in self.denoisers)
        radii = [getattr(d, "receptive_radius", None) for d in self.denoisers]
        if all(r is not None for r in radii):
            self.receptive_radius = max(radii)

    def denoise(self, x, sigma, params=None):
        # params: optional list aligned with self.denoisers
        out = 0.0
        for i, (w, d) in enumerate(zip(self.weights, self.denoisers)):
            p = params[i] if params is not None else None
            out = out + w * d.denoise(x, sigma, p)
        return out


class DeepTVDenoiser(Denoiser):
    """Weighted fusion of a deep denoiser and TV outputs.

    The reference solves a tiny cvxpy QP for fusion weights per call
    (composite.py:50-104); here the same least-squares fusion weight is
    computed in closed form (2 candidates -> scalar projection).

    ``weight``: None keeps the adaptive closed-form weight (the
    reference's behavior). A float fixes w — measured to be the better
    PnP prior (the adaptive criterion fits the NOISY input, so it keeps
    deep-branch weight exactly when the deep output retains structured
    solver artifacts; see weights/README.md for the deconv study).
    """

    def __init__(self, deep_denoiser: Denoiser, tv_iter: int = 10,
                 weight: Optional[float] = None):
        self.deep = deep_denoiser
        self.tv = TVDenoiser(iter_num=tv_iter)
        self.weight = weight
        self.params = deep_denoiser.params
        self.pretrained = deep_denoiser.pretrained

    def denoise(self, x, sigma, params=None):
        d = self.deep.denoise(x, sigma, params)
        t = self.tv.denoise(x, sigma)
        if self.weight is not None:
            return self.weight * d + (1 - self.weight) * t
        # fusion weight minimizing ||w*d + (1-w)*t - x||^2, clipped to [0,1]
        num = jnp.sum((x - t) * (d - t))
        den = jnp.sum((d - t) ** 2) + 1e-12
        w = jnp.clip(num / den, 0.0, 1.0)
        return w * d + (1 - w) * t
