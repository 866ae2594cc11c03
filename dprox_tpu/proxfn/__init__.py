from .base import ProxFn
from .simple import nonneg, norm1, norm2, soft_threshold
from .sum_squares import (
    sum_squares,
    ext_sum_squares,
    weighted_sum_squares,
    least_squares,
)
