"""Learnable per-step denoiser prior for unrolled solvers.

Counterpart of /root/reference/dprox/proxfn/unrolling/prior.py: a
DGUNet-style proximal network whose behavior depends on the unrolling
step. The cross-stage context the reference stashes on the module
(dgu.py:313-334) is an explicit carry here; proxfns that carry state set
``stateful = True`` and the solver runs a trace-time-unrolled loop
(concrete step index) instead of lax.scan.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.dgu import DGUDenoiser
from .base import ProxFn


class unrolled_prior(ProxFn):
    stateful = True

    def __init__(self, linop, denoiser: Optional[DGUDenoiser] = None,
                 max_step: Optional[int] = None, param_key: Optional[str] = None,
                 ckpt_path: Optional[str] = None):
        super().__init__(linop)
        self.module = denoiser if denoiser is not None else DGUDenoiser()
        self.param_key = param_key
        self.max_step = max_step
        self._params = None
        self._carry = None
        if ckpt_path is not None:
            # reference DGUNet torch checkpoint (name-based conversion,
            # numerically pinned by tests/test_convert_parity.py)
            from ..models.convert import load_torch_state_dict
            from ..models.dgu import convert_dgu

            init = self.module.init(jax.random.key(0),
                                    jnp.zeros((1, 32, 32, 3)))
            self._params = convert_dgu(load_torch_state_dict(ckpt_path), init)

    @property
    def params(self):
        if self._params is None:
            v = jnp.zeros((1, 32, 32, 3))
            self._params = self.module.init(jax.random.key(0), v)
        return self._params

    def reset(self):
        self._carry = None

    def _prox(self, v, lam, params=None, step=None):
        p = self.params
        if self.param_key is not None and params and self.param_key in params:
            p = params[self.param_key]
        if step is not None and hasattr(step, "aval"):
            raise ValueError(
                "unrolled_prior requires a concrete step index — solve() "
                "switches to the unrolled loop for stateful proxfns")
        step = int(step) if step is not None else 0
        nhwc = jnp.transpose(v, (0, 2, 3, 1))
        if step == 0:
            self._carry = None
        if self._carry is None:
            out, self._carry = self.module.apply(p, nhwc, method="first")
        elif self.max_step is not None and step == self.max_step - 1:
            out = self.module.apply(p, nhwc, self._carry, method="last")
        else:
            out, self._carry = self.module.apply(p, nhwc, self._carry,
                                                 method="middle")
        return jnp.transpose(out, (0, 3, 1, 2))
