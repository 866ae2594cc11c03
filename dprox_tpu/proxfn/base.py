"""Proxable-function protocol with scale/affine/translate modifiers.

Counterpart of /root/reference/dprox/proxfn/base.py. A ProxFn wraps a
linear-operator expression K (its "dag" is simply the same tree evaluated
with constants zeroed — no separate graph object needed) and exposes

    prox(v, lam) = argmin_x f(x) + 1/(2 lam) ||x - v||^2

composed from the raw ``_prox`` through three modifiers (base.py:12-27):
prox_scaled (alpha), prox_affine (beta), prox_translated (offset b).

All prox evaluations are pure: runtime data (placeholder values, the
traced iteration index, precomputed offsets) arrives via arguments.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..linop.base import LinOp, Params, Variable
from ..utils.misc import expand_to_bchw

Array = jnp.ndarray


class ProxFn:
    # stateful proxfns carry cross-iteration context (e.g. DGUNet stages)
    # and require concrete step indices -> solvers unroll instead of scan
    stateful = False

    def __init__(self, linop: LinOp, alpha: float = 1.0, beta: float = 1.0):
        self.linop = linop
        self.alpha = float(alpha)
        self.beta = float(beta)

    # ------------------------------------------------------------------ #
    # Graph evaluation (the reference's fn.dag with constants zeroed)
    # ------------------------------------------------------------------ #

    def dag_forward(self, x: Array, params: Optional[Params] = None) -> Array:
        """Linear part K x (constants zeroed)."""
        var = self.linop.variables[0]
        return self.linop.forward({var.name: x}, params, zero_constants=True)

    def dag_adjoint(self, y: Array, params: Optional[Params] = None) -> Array:
        var = self.linop.variables[0]
        acc = self.linop.adjoint(y, params)
        return acc.get(var.name, jnp.zeros_like(y))

    def offset(self, var_shapes: Dict[str, tuple], params: Optional[Params] = None):
        """b such that the expression is K x - b (= -linop constant part).

        Returns None when the linop has no constants/placeholders: the
        offset is identically zero, and callers skip the work entirely
        (two fewer elementwise passes per prox inside the solver scan).
        (reference: base.py:42-44 — ``-self.linop.offset``.)
        """
        if not self.linop.constants:
            return None
        return -self.linop.offset(var_shapes, params)

    # ------------------------------------------------------------------ #
    # Prox
    # ------------------------------------------------------------------ #

    def _prox(self, v: Array, lam: Array, params: Optional[Params] = None,
              step=None) -> Array:
        raise NotImplementedError

    def prox(self, v: Array, lam, params: Optional[Params] = None, step=None,
             offset: Optional[Array] = None) -> Array:
        """Full prox with modifiers (reference: base.py:55-64).

        ``offset`` may be passed precomputed (solvers hoist it out of the
        iteration loop); otherwise it is derived from v's shape, assuming
        the variable lives in the same space as v.
        """
        # lam stays real even when the state is complex (CSMRI)
        lam = jnp.asarray(lam)
        if jnp.iscomplexobj(lam):
            lam = jnp.real(lam)
        lam = expand_to_bchw(lam)
        if offset is None and self.linop.constants:
            var = self.linop.variables[0]
            offset = self.offset({var.name: v.shape}, params)

        def raw(v_, lam_):
            return self._prox(v_, lam_, params=params, step=step)

        def scaled(v_, lam_):  # alpha * f
            if self.alpha == 1.0:
                return raw(v_, lam_)
            return raw(v_, lam_ * self.alpha)

        def affine(v_, lam_):  # f(beta x)
            if self.beta == 1.0:
                return scaled(v_, lam_)
            return (1.0 / self.beta) * scaled(self.beta * v_, self.beta * self.beta * lam_)

        # translated: f(y - b); skipped when the offset is identically zero
        if offset is None:
            return affine(v, lam)
        return affine(v - offset, lam) + offset

    def convex_conjugate_prox(self, v: Array, lam, params=None, step=None,
                              offset=None) -> Array:
        """Moreau identity (reference: base.py:66-68)."""
        lam_e = expand_to_bchw(jnp.asarray(lam, v.dtype))
        return v - self.prox(v / lam_e, lam, params=params, step=step, offset=offset)

    # ------------------------------------------------------------------ #
    # Algebra: scalar * fn sets alpha; fn + fn builds objective lists
    # ------------------------------------------------------------------ #

    def __mul__(self, other):
        if np.isscalar(other) and other > 0:
            self.alpha = float(other)
            return self
        raise TypeError("Can only multiply a ProxFn by a positive scalar.")

    __rmul__ = __mul__

    def __add__(self, other):
        if isinstance(other, ProxFn):
            return [self, other]
        if isinstance(other, list):
            return [self] + other
        return NotImplemented

    def __radd__(self, other):
        if isinstance(other, list):
            return other + [self]
        return NotImplemented

    def __repr__(self):
        return f"{type(self).__name__}"
