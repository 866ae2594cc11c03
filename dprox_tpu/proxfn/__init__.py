from .base import ProxFn
from .simple import nonneg, norm1, norm2, soft_threshold
from .sum_squares import (
    sum_squares,
    ext_sum_squares,
    weighted_sum_squares,
    least_squares,
)
from .fast import csmri, sisr, misr, compress_sensing, spi, phase_ret
from .nlm import patch_nlm
from .unrolled import unrolled_prior
from .pnp import deep_prior, get_denoiser
