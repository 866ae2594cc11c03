"""Linear-operator expression DSL, TPU-native design.

Counterpart of the reference's linop layer
(/root/reference/dprox/linop/{base,variable,constant,placeholder,scale,sum}.py)
redesigned for JAX: operators form a *static* Python expression tree that is
closed over at trace time, while all runtime data (variable values,
placeholder values such as observations/PSFs) flows through pure functions as
explicit arguments. There is no mutable ``.value`` state, no observer
Placeholders, and no copy-node graph surgery — shared subexpressions are
memoized during forward evaluation, and adjoint contributions of fan-outs
accumulate naturally into a per-variable dict (the functional equivalent of
the reference's ``copy`` nodes, cf. comp_graph.py:89-151).

Evaluation contract::

    y   = op.forward({var_name: value}, params)       # K x (+ constants)
    acc = op.adjoint(y, params)                       # {var_name: K^T y}

``params`` is a flat dict of traced arrays keyed by placeholder name; it is
threaded through jitted solver loops so observations and learned operator
parameters (e.g. DOE PSFs) stay differentiable.

Diagonality protocol (trace-time, drives the least-squares dispatch):

* ``is_diag(freq)``     — is K (freq-)diagonal?
* ``is_gram_diag(freq)``— is K^T K (freq-)diagonal?
* ``diag(shape, params, freq)``      — amplitude diagonal of K
* ``gram_diag(shape, params, freq)`` — diagonal of K^T K  (= |diag|^2)
"""
from __future__ import annotations

import itertools
from typing import Callable, Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..utils.misc import to_jax_array

Array = jnp.ndarray
Params = Dict[str, Array]

_counter = itertools.count()


def cast_to_const(expr) -> "LinOp":
    """Wrap a raw array/scalar as a Constant (reference: base.py:11-15)."""
    return expr if isinstance(expr, LinOp) else Constant(expr)


class LinOp:
    """Abstract linear operator node."""

    def __init__(self, children: Sequence["LinOp"] = ()):
        self.children = tuple(cast_to_const(c) for c in children)
        self.linop_id = next(_counter)

    # ------------------------------------------------------------------ #
    # Computation
    # ------------------------------------------------------------------ #

    def forward(self, inputs: Dict[str, Array], params: Optional[Params] = None,
                zero_constants: bool = False, cache: Optional[dict] = None) -> Array:
        """Evaluate K applied to variable values ``inputs``.

        ``zero_constants=True`` evaluates only the linear part (the
        reference builds a separate constant-zeroed CompGraph per ProxFn;
        here it is just a flag). ``cache`` memoizes shared subexpressions.
        """
        if cache is None:
            cache = {}
        key = (id(self), zero_constants)
        if key not in cache:
            cache[key] = self._forward(
                [c.forward(inputs, params, zero_constants, cache) for c in self.children],
                params,
            )
        return cache[key]

    def adjoint(self, y: Array, params: Optional[Params] = None) -> Dict[str, Array]:
        """K^T y, returned as accumulated per-variable contributions."""
        acc: Dict[str, Array] = {}
        self.adjoint_into(y, params, acc)
        return acc

    def adjoint_into(self, y: Array, params: Optional[Params], acc: Dict[str, Array]):
        for child, yc in zip(self.children, self._adjoint(y, params)):
            child.adjoint_into(yc, params, acc)

    def _forward(self, child_values: Sequence[Array], params: Optional[Params]) -> Array:
        raise NotImplementedError

    def _adjoint(self, y: Array, params: Optional[Params]) -> Sequence[Array]:
        """Per-child adjoint cotangents."""
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    # Structure
    # ------------------------------------------------------------------ #

    @property
    def variables(self):
        """Unique Variables in creation order (reference: base.py:93-100)."""
        seen, out = set(), []
        for c in self.children:
            for v in c.variables:
                if v.name not in seen:
                    seen.add(v.name)
                    out.append(v)
        return sorted(out, key=lambda v: v.linop_id)

    @property
    def constants(self):
        out = []
        for c in self.children:
            out.extend(c.constants)
        return out

    def is_constant(self) -> bool:
        return len(self.variables) == 0

    def offset(self, var_shapes: Dict[str, tuple], params: Optional[Params] = None,
               dtype=jnp.float32) -> Array:
        """Constant offset: the tree's value with all variables zeroed.

        (reference: base.py:119-129 — there done by mutating
        Variable.value and running the graph.) Evaluated STRUCTURALLY:
        purely-linear subtrees are zero by linearity and are skipped
        instead of materializing zeros and pushing them through the op
        (for ``conv(x) - b`` the naive evaluation runs a conv-of-zeros —
        two wasted FFTs that, under a spatial mesh, are also the only
        device-local FFTs left in the program and trip the XLA CPU fft
        thunk's layout RET_CHECK). Identical values either way.
        """
        res = self._offset_rec(var_shapes, params, dtype)
        if res is None:
            # no constants anywhere: the offset is exactly zero — keep
            # the legacy dense-zeros return for callers that consume it
            zeros = {name: jnp.zeros(shape, dtype)
                     for name, shape in var_shapes.items()}
            return self.forward(zeros, params)
        return res

    def _offset_rec(self, var_shapes, params, dtype):
        if not self.constants:
            return None  # linear in the variables: contributes zero
        if self.is_constant():
            return self.forward({}, params)
        if isinstance(self, sum):
            out = None
            for c in self.children:
                r = c._offset_rec(var_shapes, params, dtype)
                if r is not None:
                    out = r if out is None else out + r
            return out
        # mixed non-sum branch (constant under a non-trivial op): fall
        # back to zeros-evaluation of this subtree
        zeros = {name: jnp.zeros(shape, dtype)
                 for name, shape in var_shapes.items()}
        return self.forward(zeros, params)

    # ------------------------------------------------------------------ #
    # Diagonality
    # ------------------------------------------------------------------ #

    def is_diag(self, freq: bool = False) -> bool:
        return False

    def is_gram_diag(self, freq: bool = False) -> bool:
        return self.is_diag(freq)

    def diag(self, shape, params: Optional[Params] = None, freq: bool = False) -> Array:
        """Amplitude diagonal of K, broadcastable to ``shape`` (BCHW)."""
        raise NotImplementedError(f"{type(self).__name__} has no diagonal")

    def gram_diag(self, shape, params: Optional[Params] = None, freq: bool = False) -> Array:
        d = self.diag(shape, params, freq)
        return jnp.abs(jnp.conj(d) * d)

    # ------------------------------------------------------------------ #
    # Frequency-circulant gram surrogate (preconditioning)
    # ------------------------------------------------------------------ #

    def _own_gram_surrogate(self, shape, params: Optional[Params] = None):
        """Node-local circulant approximation of THIS op's gram factor
        in the frequency domain (children excluded): exact for
        freq-diagonal ops, spatial average (per channel — stays
        channelwise-circulant) for spatially-diagonal ops, None when no
        sensible surrogate exists. Overridden per op; unknown ops
        default to None (disables preconditioning for the tree)."""
        return None

    def gram_freq_surrogate(self, shape, params: Optional[Params] = None):
        """Approximate frequency-domain diagonal of this subtree's gram
        K^T K — a circulant surrogate used as a Jacobi-in-frequency
        preconditioner for the CG x-update (no reference counterpart;
        the reference's imaging CG is unpreconditioned,
        linalg/solver_cg.py). Composition chains multiply their factors'
        surrogates (exact when every factor is circulant; an averaged
        approximation otherwise — fine for an SPD preconditioner).
        Returns None when any factor has no surrogate."""
        own = self._own_gram_surrogate(shape, params)
        if own is None:
            return None
        out = own
        for c in self.children:
            cs = c.gram_freq_surrogate(shape, params)
            if cs is None:
                return None
            out = out * cs
        return out

    # ------------------------------------------------------------------ #
    # Norm bound (power-iteration seed)
    # ------------------------------------------------------------------ #

    def norm_bound(self, input_mags):
        return NotImplemented

    # ------------------------------------------------------------------ #
    # Operator algebra (reference: base.py:181-241)
    # ------------------------------------------------------------------ #

    def __add__(self, other):
        other = cast_to_const(other)
        args = []
        for elem in (self, other):
            args.extend(elem.children if isinstance(elem, sum) else [elem])
        return sum(args)

    def __radd__(self, other):
        return cast_to_const(other) + self

    def __mul__(self, other):
        if np.isscalar(other):
            return scale(other, self)
        raise TypeError("Can only multiply a LinOp by a scalar constant.")

    __rmul__ = __mul__

    def __truediv__(self, other):
        if np.isscalar(other):
            return scale(1.0 / other, self)
        raise TypeError("Can only divide a LinOp by a scalar constant.")

    def __sub__(self, other):
        return self + (-cast_to_const(other))

    def __rsub__(self, other):
        return (-self) + cast_to_const(other)

    def __neg__(self):
        return scale(-1.0, self)

    def __rmatmul__(self, other):
        # A @ x — sparse-matrix objective/constraint sugar for the LP path
        from .constraints import matmul

        return matmul(self, other)

    def __repr__(self):
        return f"{type(self).__name__}({', '.join(repr(c) for c in self.children)})"

    __array_priority__ = 10000


class Variable(LinOp):
    """Leaf variable; identity forward/adjoint (reference: variable.py)."""

    def _own_gram_surrogate(self, shape, params=None):
        return 1.0

    def __init__(self, shape=None, name: Optional[str] = None):
        super().__init__([])
        self.shape = shape
        self.name = name if name is not None else f"var{self.linop_id}"

    def forward(self, inputs, params=None, zero_constants=False, cache=None):
        return inputs[self.name]

    def adjoint_into(self, y, params, acc):
        if self.name in acc:
            acc[self.name] = acc[self.name] + y
        else:
            acc[self.name] = y

    @property
    def variables(self):
        return [self]

    def is_diag(self, freq: bool = False) -> bool:
        return True

    def diag(self, shape, params=None, freq: bool = False):
        return jnp.ones((), jnp.float32)

    def norm_bound(self, input_mags):
        return 1.0

    def __repr__(self):
        return f"Variable(name={self.name}, shape={self.shape})"


class Constant(LinOp):
    """Constant leaf; zero linear part (reference: constant.py:7-33)."""

    def __init__(self, value):
        super().__init__([])
        self.value = to_jax_array(value, batch=True)

    def forward(self, inputs, params=None, zero_constants=False, cache=None):
        if zero_constants:
            return jnp.zeros_like(self.value)
        return self.value

    def adjoint_into(self, y, params, acc):
        pass  # adjoint of a constant is zero: contributes nothing

    @property
    def constants(self):
        return [self]

    def is_diag(self, freq: bool = False) -> bool:
        return True

    def diag(self, shape, params=None, freq: bool = False):
        return jnp.zeros((), jnp.float32)

    def norm_bound(self, input_mags):
        return 0.0

    def __repr__(self):
        return f"Constant(shape={tuple(self.value.shape)})"


class Placeholder(LinOp):
    """Named runtime constant; value comes from ``params`` at call time.

    Replaces the reference's observer-pattern Placeholder
    (/root/reference/dprox/linop/placeholder.py): instead of mutating
    ``.value`` and firing watcher callbacks, the value is an entry of the
    traced ``params`` dict, so it can change per batch/step under jit and
    receive gradients (e.g. learned PSFs).
    """

    def __init__(self, name: Optional[str] = None, batch: bool = True):
        super().__init__([])
        self.name = name if name is not None else f"ph{self.linop_id}"
        self.batch = batch

    def value(self, params: Optional[Params]):
        if params is None or self.name not in params:
            raise KeyError(
                f"Placeholder '{self.name}' has no value; pass params={{'{self.name}': ...}}"
            )
        return to_jax_array(params[self.name], batch=self.batch)

    def forward(self, inputs, params=None, zero_constants=False, cache=None):
        v = self.value(params)
        if zero_constants:
            return jnp.zeros_like(v)
        return v

    def adjoint_into(self, y, params, acc):
        pass

    @property
    def constants(self):
        return [self]

    def is_diag(self, freq: bool = False) -> bool:
        return True

    def diag(self, shape, params=None, freq: bool = False):
        return jnp.zeros((), jnp.float32)

    def __repr__(self):
        return f"Placeholder(name={self.name})"


class scale(LinOp):
    """Multiplication by a fixed scalar (reference: scale.py)."""

    def __init__(self, scalar, arg):
        assert np.isscalar(scalar)
        self.scalar = float(scalar)
        super().__init__([arg])

    def _forward(self, child_values, params):
        return child_values[0] * self.scalar

    def _adjoint(self, y, params):
        return [y * self.scalar]

    def is_diag(self, freq: bool = False) -> bool:
        return self.children[0].is_diag(freq)

    def is_gram_diag(self, freq: bool = False) -> bool:
        return self.children[0].is_gram_diag(freq)

    def diag(self, shape, params=None, freq: bool = False):
        return self.children[0].diag(shape, params, freq) * self.scalar

    def gram_diag(self, shape, params=None, freq: bool = False):
        return self.children[0].gram_diag(shape, params, freq) * (self.scalar**2)

    def _own_gram_surrogate(self, shape, params=None):
        return self.scalar ** 2

    def norm_bound(self, input_mags):
        return abs(self.scalar) * input_mags[0]


class sum(LinOp):
    """Sum of N inputs; adjoint broadcasts (reference: sum.py)."""

    def __init__(self, children):
        super().__init__(children)

    def _forward(self, child_values, params):
        out = child_values[0]
        for v in child_values[1:]:
            out = out + v
        return out

    def _adjoint(self, y, params):
        return [y] * len(self.children)

    def is_diag(self, freq: bool = False) -> bool:
        return all(c.is_diag(freq) for c in self.children)

    def is_gram_diag(self, freq: bool = False) -> bool:
        return all(c.is_gram_diag(freq) for c in self.children)

    def diag(self, shape, params=None, freq: bool = False):
        out = None
        for c in self.children:
            d = c.diag(shape, params, freq)
            out = d if out is None else out + d
        return out

    def gram_freq_surrogate(self, shape, params=None):
        # constants (offsets like ``conv(x) - b``) do not contribute to
        # the variable gram; cross terms of >1 variable branch have no
        # circulant surrogate
        live = [c for c in self.children if not c.is_constant()]
        if len(live) != 1:
            return None
        return live[0].gram_freq_surrogate(shape, params)

    def norm_bound(self, input_mags):
        return float(np.sum(input_mags))


class vstack(LinOp):
    """Stack of independent operator branches (list-in, list-out).

    Unlike the reference's vstack node inside a CompGraph
    (/root/reference/dprox/linop/vstack.py), algorithms here operate on
    plain lists of per-ProxFn operators; this class exists for API parity
    and joint diagonality queries.
    """

    def __init__(self, children):
        super().__init__(children)

    def forward_list(self, inputs, params=None, zero_constants=False):
        cache: dict = {}
        return [c.forward(inputs, params, zero_constants, cache) for c in self.children]

    def adjoint_list(self, ys, params=None) -> Dict[str, Array]:
        acc: Dict[str, Array] = {}
        for c, y in zip(self.children, ys):
            c.adjoint_into(y, params, acc)
        return acc

    def is_gram_diag(self, freq: bool = False) -> bool:
        return all(c.is_gram_diag(freq) for c in self.children)

    def gram_diag(self, shape, params=None, freq: bool = False):
        out = None
        for c in self.children:
            d = c.gram_diag(shape, params, freq)
            out = d if out is None else out + d
        return out

    def gram_freq_surrogate(self, shape, params=None):
        # gram of a stack is the sum of the per-branch grams
        out = None
        for c in self.children:
            s = c.gram_freq_surrogate(shape, params)
            if s is None:
                return None
            out = s if out is None else out + s
        return out

    def norm_bound(self, input_mags):
        return float(np.linalg.norm(input_mags, 2))


class split(vstack):
    """Transpose of ``vstack``: one input fanned out to per-branch
    adjoints / gathered by forward accumulation.

    In the reference this is the stacked graph's source node over
    per-variable copy nodes (/root/reference/dprox/linop/vstack.py,
    documented in its API reference); algorithms here consume fn lists
    directly, so this class exists for drop-in API parity — forward and
    adjoint are vstack's swapped."""

    def forward_list(self, ys, params=None, zero_constants=False):
        return super().adjoint_list(ys, params)

    def adjoint_list(self, inputs, params=None):
        return super().forward_list(inputs, params)
