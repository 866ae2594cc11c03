from .base import (
    LinOp,
    Variable,
    Constant,
    Placeholder,
    scale,
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
