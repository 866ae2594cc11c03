"""Torch-checkpoint -> flax-params conversion for the denoiser zoo.

The reference ships pretrained torch state_dicts from HuggingFace
(/root/reference/dprox/utils/huggingface.py). This module converts them
into our flax modules' param pytrees by positional matching: both the
torch Sequential stacks and our nn.compact modules create conv layers in
the same order, so kernels map OIHW -> HWIO one-for-one. Adjacent
BatchNorm layers (DnCNN 'BR' checkpoints) are folded into the preceding
conv (inference-only).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp


def _is_conv_weight(k: str, v) -> bool:
    return k.endswith("weight") and getattr(v, "ndim", 0) == 4


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "net" in sd:
        sd = sd["net"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def fold_batchnorm(sd: Dict[str, np.ndarray],
                   bn_eps: float = 1e-4) -> Dict[str, np.ndarray]:
    """Fold conv->BN pairs into the conv (keys must be ordered).

    ``bn_eps`` defaults to 1e-4: every BN-bearing 2-D checkpoint in the
    reference zoo builds its BatchNorm2d with eps=1e-04 (KAIR style,
    reference denoisers/models/basicblock.py:69) — the torch default
    1e-5 costs ~3e-3 relative output error on low-variance channels.
    """
    keys = list(sd.keys())
    out = dict(sd)
    for i, k in enumerate(keys):
        if k.endswith("running_mean"):
            prefix = k[: -len("running_mean")]
            mean = sd[prefix + "running_mean"]
            var = sd[prefix + "running_var"]
            gamma = sd.get(prefix + "weight", np.ones_like(mean))
            beta = sd.get(prefix + "bias", np.zeros_like(mean))
            # find the nearest preceding conv weight
            conv_w_key = None
            for j in range(i - 1, -1, -1):
                if _is_conv_weight(keys[j], sd[keys[j]]):
                    conv_w_key = keys[j]
                    break
            if conv_w_key is None:
                continue
            scale = gamma / np.sqrt(var + bn_eps)
            w = sd[conv_w_key] * scale[:, None, None, None]
            conv_b_key = conv_w_key[: -len("weight")] + "bias"
            b = sd.get(conv_b_key, np.zeros_like(mean))
            b = (b - mean) * scale + beta
            out[conv_w_key] = w
            out[conv_b_key] = b
            for suffix in ("running_mean", "running_var", "weight", "bias",
                           "num_batches_tracked"):
                out.pop(prefix + suffix, None)
    return out


def _iter_conv_dicts(params, path=()):
    """Yield (path, leaf_dict) for every conv param group ({'kernel',
    optional 'bias'}) in INSERTION order of the nested dicts.

    Flax builds the params dict in module-creation order (= the torch
    Sequential order for this zoo), but jax.tree_util flattens dicts in
    sorted-key order, which mis-pairs stacks of >=10 convs
    ('Conv_10' sorts before 'Conv_2') and any net mixing module types
    ('DownStrideConv_*' vs 'ResBlock_*'). Walking the raw dict preserves
    creation order, which is the invariant positional matching needs.
    """
    if isinstance(params, dict):
        if "kernel" in params:
            yield path, params
            return
        for k, v in params.items():
            yield from _iter_conv_dicts(v, path + (k,))


def torch_to_flax(sd: Dict[str, np.ndarray], flax_params,
                  bn_eps: float = 1e-4) -> Dict:
    """Positionally map an (ordered) torch state_dict onto flax params.

    Conv kernels: OIHW -> HWIO; transpose convs (flax path contains
    'ConvTranspose'): IOHW -> HWIO with spatial flip matching jax
    ConvTranspose semantics; 3-D convs: OIDHW -> DHWIO. BatchNorms fold
    into the preceding conv (see :func:`fold_batchnorm` for bn_eps).
    """
    sd = fold_batchnorm(sd, bn_eps=bn_eps)
    convs: List[tuple] = []  # (weight, bias or None)
    keys = [k for k in sd if k.endswith("weight") and sd[k].ndim in (4, 5)]
    for k in keys:
        w = sd[k]
        b = sd.get(k[: -len("weight")] + "bias")
        convs.append((w, b))

    def _copy(d):  # manual deep copy: jax.tree.map would SORT dict keys
        return {k: _copy(v) for k, v in d.items()} if isinstance(d, dict) else d

    params = _copy(flax_params)
    conv_idx = 0
    for path, leaf in _iter_conv_dicts(params):
        v = leaf["kernel"]
        if getattr(v, "ndim", 0) not in (4, 5):
            continue  # Dense or scale params are not positional convs
        if conv_idx >= len(convs):
            raise ValueError("torch checkpoint has fewer convs than the flax model")
        w, b = convs[conv_idx]
        conv_idx += 1
        is_transpose = any("ConvTranspose" in c for c in path)
        if w.ndim == 5:  # torch Conv3d OIDHW -> flax DHWIO
            wj = np.transpose(w, (2, 3, 4, 1, 0))
        elif is_transpose:
            # torch ConvTranspose2d: IOHW; flax ConvTranspose kernel HWIO
            # with flipped spatial taps relative to torch
            wj = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
        else:
            wj = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        if wj.shape != v.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: torch {w.shape} "
                f"-> {wj.shape} vs flax {v.shape}")
        leaf["kernel"] = jnp.asarray(np.ascontiguousarray(wj))
        if b is not None and "bias" in leaf:
            assert leaf["bias"].shape == b.shape, \
                f"bias shape at {'/'.join(path)}: {b.shape} vs {leaf['bias'].shape}"
            leaf["bias"] = jnp.asarray(b)
    if conv_idx != len(convs):
        raise ValueError(
            f"torch checkpoint has {len(convs)} convs, flax consumed {conv_idx}")
    return params


# ---------------------------------------------------------------------------
# QRNN3D / GRUNet conversion (pre-BN, deconvs, registration-order quirks)
# ---------------------------------------------------------------------------

# torch GRUnet registers Down1..4 before Conv1..5 (reference
# models/qrnn/grunet.py:44-68) but CALLS them interleaved; flax creation
# order is call order, so the state_dict is re-bucketed to forward order
# before positional matching.
GRUNET_FORWARD_ORDER = (
    "Conv1", "Down1", "Conv2", "Down2", "Conv3", "Down3", "Conv4", "Down4",
    "Conv5", "Up5", "Up_conv5", "Up4", "Up_conv4", "Up3", "Up_conv3",
    "Up2", "Up_conv2", "Conv")


def reorder_state_dict(sd: Dict[str, np.ndarray], prefix_order):
    """Stable re-bucket of state_dict keys by top-level module prefix."""
    buckets = {p: [] for p in prefix_order}
    rest = []
    for k in sd:
        for p in prefix_order:
            if k == p or k.startswith(p + "."):
                buckets[p].append(k)
                break
        else:
            rest.append(k)
    keys = [k for p in prefix_order for k in buckets[p]] + rest
    return {k: sd[k] for k in keys}


def _iter_qrnn_groups(params, holder=None):
    """Yield (bn_holder_dict_or_None, conv_leaf_dict) in creation order.

    pre_bn modules put (bn_scale, bn_shift) on the wrapper whose single
    conv child holds the kernel (models/qrnn.py Conv3d/UpsampleConv3d).
    """
    if isinstance(params, dict):
        if "kernel" in params:
            yield holder, params
            return
        h = params if "bn_scale" in params else holder
        for k, v in params.items():
            if k in ("bn_scale", "bn_shift"):
                continue
            yield from _iter_qrnn_groups(v, h)


def qrnn_torch_to_flax(sd: Dict[str, np.ndarray], flax_params,
                       prefix_order=None, bn_eps: float = 1e-5) -> Dict:
    """Convert a QRNN3D/GRUNet torch checkpoint onto flax params.

    Handles the three quirks the generic converter cannot (reference
    models/qrnn/{conv,layer,grunet,qrnn3d}.py):
      * pre-conv SynchronizedBatchNorm3d (eps=1e-5) -> explicit
        (bn_scale, bn_shift) params, NOT folded into the conv (folding a
        PRE-norm is inexact at zero-padded borders);
      * stride-1 ConvTranspose3d decoder layers ('deconv'/'upsample' in
        the key is irrelevant — detected by the IODHW shape mismatch is
        unsafe for square layers, so by key name) -> regular convs with
        spatially flipped, in/out-swapped kernels (exact for s=1);
      * GRUnet registration order != call order -> ``prefix_order``.
    """
    if prefix_order:
        sd = reorder_state_dict(sd, prefix_order)
    entries = []
    pending = None
    for k in sd:
        v = sd[k]
        if k.endswith("running_mean"):
            pre = k[: -len("running_mean")]
            mean = np.asarray(sd[pre + "running_mean"], np.float64)
            var = np.asarray(sd[pre + "running_var"], np.float64)
            gamma = np.asarray(sd.get(pre + "weight", np.ones_like(mean)),
                               np.float64)
            beta = np.asarray(sd.get(pre + "bias", np.zeros_like(mean)),
                              np.float64)
            scale = gamma / np.sqrt(var + bn_eps)
            pending = (scale.astype(np.float32),
                       (beta - mean * scale).astype(np.float32))
        elif k.endswith("weight") and getattr(v, "ndim", 0) == 5:
            b = sd.get(k[: -len("weight")] + "bias")
            entries.append((v, b, "deconv" in k, pending))
            pending = None

    def _copy(d):
        return {k: _copy(v) for k, v in d.items()} if isinstance(d, dict) else d

    params = _copy(flax_params)
    idx = 0
    for holder, leaf in _iter_qrnn_groups(params):
        if getattr(leaf["kernel"], "ndim", 0) != 5:
            continue
        if idx >= len(entries):
            raise ValueError("torch checkpoint has fewer 3-D convs than flax")
        w, b, is_deconv, bn = entries[idx]
        idx += 1
        if is_deconv:
            # ConvTranspose3d (I,O,D,H,W), s=1: equals a regular conv
            # with all spatial taps flipped and in/out swapped
            wj = np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1))
        else:
            wj = np.transpose(w, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO
        if wj.shape != leaf["kernel"].shape:
            raise ValueError(
                f"3-D conv shape mismatch: torch {w.shape} -> {wj.shape} "
                f"vs flax {leaf['kernel'].shape}")
        leaf["kernel"] = jnp.asarray(np.ascontiguousarray(wj))
        if b is not None and "bias" in leaf:
            leaf["bias"] = jnp.asarray(b)
        if (bn is not None) != (holder is not None):
            raise ValueError(
                f"BN mismatch at conv {idx - 1}: torch has"
                f"{' ' if bn is not None else ' no '}pre-BN, flax module "
                f"{'declares' if holder is not None else 'declares no'} "
                f"bn params (check the bn= flag on the flax net)")
        if bn is not None:
            scale, shift = bn
            assert holder["bn_scale"].shape == scale.shape
            holder["bn_scale"] = jnp.asarray(scale)
            holder["bn_shift"] = jnp.asarray(shift)
    if idx != len(entries):
        raise ValueError(
            f"torch checkpoint has {len(entries)} 3-D convs, flax "
            f"consumed {idx}")
    return params
