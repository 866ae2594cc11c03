"""dprox_tpu — TPU-native differentiable proximal optimization framework.

A from-scratch JAX/XLA/Pallas implementation of the Delta-Prox capability
surface (see SURVEY.md): a DSL for objectives that are sums of proxable
functions of linear-operator expressions, compiled into jitted proximal
splitting solvers (ADMM / LADMM / HQS / Pock-Chambolle / PGD) with
FFT-diagonal or implicit-gradient CG x-updates, solver specialization
(unrolling / deep equilibrium / RL tuning), plug-and-play deep denoiser
priors, DOE optics co-design, and a learnable LP/QP path — sharded over
TPU meshes for multi-chip scaling.
"""

__version__ = "0.1.0"

from . import linop
from . import proxfn
from . import linalg
from . import algo
from . import utils

from .linop import (
    LinOp,
    Variable,
    Constant,
    Placeholder,
    conv,
    conv_doe,
    grad,
    mosaic,
    scale,
    mul_color,
    mul_elementwise,
    BlackBox,
    LinOpFactory,
    vstack,
    split,
    sum,
    copy,
    eval,
    adjoint,
    gram,
    validate,
    est_norm,
    est_CompGraph_norm,
)
from .proxfn import (
    ProxFn,
    sum_squares,
    ext_sum_squares,
    weighted_sum_squares,
    least_squares,
    nonneg,
    norm1,
    norm2,
    csmri,
    sisr,
    misr,
    compress_sensing,
    spi,
    phase_ret,
    patch_nlm,
    unrolled_prior,
    deep_prior,
    get_denoiser,
)
from .linalg import LinearSolveConfig, linear_solve
from .algo import (
    Problem,
    Algorithm,
    ADMM,
    ADMM_vxu,
    LinearizedADMM,
    HQS,
    PockChambolle,
    ProximalGradientDescent,
    compile,
    specialize,
    optimize,
    train,
    visualize,
    log_descent,
)
from .algo.special import AutoTuneSolver, DEQSolver, UnrolledSolver
from .utils.misc import array, to_jax_array as tensor
# reference-compat cache location (dprox/__init__.py:6-9 exports
# utils.huggingface.CACHE_DIR; weights here resolve through utils.hub's
# offline search path, whose first entry plays the same role)
from .utils.hub import CACHE_DIRS
CACHE_DIR = next((d for d in CACHE_DIRS if d), "~/.cache/dprox")
__cache_dir__ = CACHE_DIR
