"""Learnable degradation operator for deraining (DGUNet-style).

Counterpart of /root/reference/dprox/contrib/derain.py: per-step ResBlock
networks phi / phi^T / (phi_d) acting as a learned forward/adjoint/diag.
Step indices are concrete (the derain solver is unrolled), selecting
among first/middle/last parameter sets like the reference's step rule
(derain.py:59-83).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..linop.ops import BlackBox
from ..models.dgu import PReLU


class ResBlock(nn.Module):
    """conv(3->64)-PReLU-conv(64->3) residual (reference: derain.py:8-31)."""

    n_feats: int = 3

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(64, (3, 3), padding=1, use_bias=True)(x)
        r = PReLU()(r)
        # zero-init the residual branch so phi(x) = x before training:
        # the untrained unrolled solver then behaves like an identity
        # degradation instead of diverging (the reference always loads a
        # trained checkpoint here, derain.py:34-38)
        r = nn.Conv(self.n_feats, (3, 3), padding=1, use_bias=True,
                    kernel_init=nn.initializers.zeros)(r)
        return x + r


class LearnableDegOp:
    """Bundle of step-indexed ResBlocks; exposes forward/adjoint/diag
    closures compatible with BlackBox/LinOpFactory."""

    def __init__(self, diag: bool = False, max_step: int = 5, param_key: str = "deg_op"):
        self.diag = diag
        self.max_step = max_step
        self.param_key = param_key
        names = ["phi_0", "phi_1", "phi_6", "phit_0", "phit_1", "phit_6"]
        if diag:
            names += ["phid_0", "phid_1", "phid_6"]
        self.modules = {n: ResBlock() for n in names}
        v = jnp.zeros((1, 8, 8, 3))
        self._params = {n: m.init(jax.random.key(i), v)
                        for i, (n, m) in enumerate(self.modules.items())}

    @property
    def params(self):
        return self._params

    def _select(self, kind: str, step) -> str:
        step = int(step) if step is not None else 0
        if step == 0:
            return f"{kind}_0"
        if step == self.max_step + 1:
            return f"{kind}_6"
        return f"{kind}_1"

    def _apply(self, kind, x, params, step):
        p = self._params
        if params and self.param_key in params:
            p = params[self.param_key]
        name = self._select(kind, step)
        nhwc = jnp.transpose(x, (0, 2, 3, 1))
        out = self.modules[name].apply(p[name], nhwc)
        return jnp.transpose(out, (0, 3, 1, 2))

    def forward(self, x, params=None, step=None):
        return self._apply("phi", x, params, step)

    def adjoint(self, x, params=None, step=None):
        return self._apply("phit", x, params, step)

    def diag_fn(self, shape, params=None, step=None):
        raise NotImplementedError("diag variant used only with explicit x")

    def as_linop(self, arg):
        return BlackBox(arg, self.forward, self.adjoint)
