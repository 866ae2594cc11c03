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


def fold_batchnorm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold conv->BN pairs into the conv (keys must be ordered)."""
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
            scale = gamma / np.sqrt(var + 1e-5)
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


def torch_to_flax(sd: Dict[str, np.ndarray], flax_params) -> Dict:
    """Positionally map an (ordered) torch state_dict onto flax params.

    Kernels: OIHW -> HWIO; transpose convs: IOHW -> HWIO with spatial flip
    matching jax ConvTranspose semantics.
    """
    sd = fold_batchnorm(sd)
    convs: List[tuple] = []  # (weight, bias or None, is_transpose)
    keys = [k for k in sd if k.endswith("weight") and sd[k].ndim == 4]
    for k in keys:
        w = sd[k]
        b = sd.get(k[: -len("weight")] + "bias")
        convs.append((w, b))

    flat, treedef = jax.tree_util.tree_flatten_with_path(flax_params)
    # group flax leaves by module path: kernel (+ bias)
    new_leaves = []
    conv_idx = 0
    path_map = {jax.tree_util.keystr(p): i for i, (p, _) in enumerate(flat)}
    leaves = [v for _, v in flat]

    # iterate kernels in flax traversal order
    kernel_indices = [i for i, (p, v) in enumerate(flat)
                      if jax.tree_util.keystr(p).endswith("['kernel']")]
    for i in kernel_indices:
        p, v = flat[i]
        if conv_idx >= len(convs):
            raise ValueError("torch checkpoint has fewer convs than the flax model")
        w, b = convs[conv_idx]
        conv_idx += 1
        if w.shape[0] == v.shape[-1] and w.shape[1] == v.shape[-2]:
            wj = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        elif w.shape[1] == v.shape[-1] and w.shape[0] == v.shape[-2]:
            # torch ConvTranspose2d: IOHW; flax ConvTranspose kernel HWIO
            # with flipped spatial taps relative to torch
            wj = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
        else:
            raise ValueError(f"shape mismatch: torch {w.shape} vs flax {v.shape}")
        assert wj.shape == v.shape, f"{wj.shape} != {v.shape}"
        leaves[i] = jnp.asarray(wj)
        bias_key = jax.tree_util.keystr(p).replace("['kernel']", "['bias']")
        if b is not None and bias_key in path_map:
            j = path_map[bias_key]
            assert flat[j][1].shape == b.shape
            leaves[j] = jnp.asarray(b)
    if conv_idx != len(convs):
        raise ValueError(
            f"torch checkpoint has {len(convs)} convs, flax consumed {conv_idx}")
    return jax.tree_util.tree_unflatten(treedef, leaves)
