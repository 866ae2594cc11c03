from .base import (
    LinOp,
    Variable,
    Constant,
    Placeholder,
    scale,
    split,
    sum,
    vstack,
    cast_to_const,
)
from .ops import (
    conv,
    conv_doe,
    grad,
    mosaic,
    mul_color,
    mul_elementwise,
    BlackBox,
    LinOpFactory,
)
from .constraints import matmul, equality, less
from .evaluate import eval, adjoint, gram, validate, est_norm
from .visualize import visualize, to_dot, to_text

# reference-compat aliases. The reference's ``copy`` node duplicates a
# shared subexpression so its adjoint accumulates
# (linop/comp_graph.py:89-118); functional adjoint accumulation makes
# that a no-op here (tests/test_linop.py::test_shared_subexpression).
# ``split`` (vstack's transpose, documented in the reference API) is
# exported from .base as a parity shim.


def est_CompGraph_norm(op, tol: float = 1e-3, try_fast_norm: bool = False,
                       shape=None, **kwargs):
    """Reference-signature wrapper around est_norm
    (reference: linop/comp_graph.py:389-423 — tol/try_fast_norm are
    accepted for drop-in compatibility; power iteration here always
    runs to its fixed iteration budget)."""
    del tol, try_fast_norm
    if shape is not None:
        kwargs["shape"] = shape
    return est_norm(op, **kwargs)


def copy(op):
    """Identity (reference-compat): shared subexpressions need no copy
    nodes under functional evaluation."""
    return op
