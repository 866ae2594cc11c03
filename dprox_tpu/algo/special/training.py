"""Shared supervised training loop (optax) with checkpoint/resume.

Counterpart of the trainers in /root/reference/dprox/algo/primitives.py:
124-205 and deq/training.py:12-116: AdamW, per-epoch PSNR tracking,
``last.pth``-style checkpointing with full resume of counters.
Checkpoints serialize the param pytree with flax.serialization.
"""
from __future__ import annotations

import os
import pickle
from typing import Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization


def save_checkpoint(path: str, params, opt_state, epoch: int, gstep: int,
                    best_psnr: float):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = {
        "params": serialization.to_bytes(params),
        "opt_state": serialization.to_bytes(opt_state),
        "epoch": epoch,
        "gstep": gstep,
        "best_psnr": best_psnr,
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_checkpoint(path: str, params_template, opt_state_template):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    params = serialization.from_bytes(params_template, blob["params"])
    opt_state = serialization.from_bytes(opt_state_template, blob["opt_state"])
    return params, opt_state, blob["epoch"], blob["gstep"], blob["best_psnr"]


def train_supervised(step_fn: Callable, dataset: Iterable, init_params,
                     epochs: int = 10, lr: float = 1e-4, weight_decay: float = 1e-4,
                     savedir: Optional[str] = None, resume: bool = False,
                     eval_fn: Optional[Callable] = None, log_every: int = 50,
                     seed: int = 0):
    """Generic loop: ``step_fn(params, batch, key) -> loss``.

    Returns the trained params. ``eval_fn(params) -> psnr`` drives
    best-checkpoint tracking.
    """
    tx = optax.adamw(lr, weight_decay=weight_decay)
    params = init_params
    opt_state = tx.init(params)
    start_epoch, gstep, best_psnr = 0, 0, -np.inf

    ckpt_last = os.path.join(savedir, "last.ckpt") if savedir else None
    if resume and ckpt_last and os.path.exists(ckpt_last):
        params, opt_state, start_epoch, gstep, best_psnr = load_checkpoint(
            ckpt_last, params, opt_state)

    @jax.jit
    def update(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(step_fn)(params, batch, key)
        # NaN-robustness: skip the update when loss/grads are non-finite
        # (the reference keeps a commented-out reload-last-ckpt path,
        # deq/training.py:41-47; masking the step is the pure equivalent)
        finite = jnp.isfinite(loss)
        for g in jax.tree.leaves(grads):
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    key = jax.random.key(seed)
    for epoch in range(start_epoch, epochs):
        losses = []
        for batch in dataset:
            key, sub = jax.random.split(key)
            params, opt_state, loss = update(params, opt_state, batch, sub)
            losses.append(float(loss))
            gstep += 1
            if log_every and gstep % log_every == 0:
                print(f"epoch {epoch} step {gstep} loss {np.mean(losses[-log_every:]):.5f}")
        if eval_fn is not None:
            psnr = float(eval_fn(params))
            if psnr > best_psnr:
                best_psnr = psnr
                if savedir:
                    save_checkpoint(os.path.join(savedir, "best.ckpt"), params,
                                    opt_state, epoch, gstep, best_psnr)
        if savedir:
            save_checkpoint(ckpt_last, params, opt_state, epoch + 1, gstep,
                            best_psnr)
    return params
