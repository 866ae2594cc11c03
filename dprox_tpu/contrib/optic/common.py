"""Namespace-parity module for the reference's ``dprox.contrib.optic.common``
(/root/reference/dprox/contrib/optic/common.py): wave-optics helpers that
live in ``doe_model`` here, plus the phase-shift thickness formula.
"""
from __future__ import annotations

import numpy as np

from .doe_model import (  # noqa: F401
    FresnelPropagator,
    area_downsampling,
    get_coordinate,
    img_psf_conv,
    psf2otf_4d,
)


def get_one_phase_shift_thickness(wave_lengths, refractive_index):
    """Thickness (meters) of material producing a 2*pi phase shift
    (reference: optic/common.py:167-175): (2*pi) / (k * (n - 1)) = lambda / (n - 1)."""
    wave_lengths = np.asarray(wave_lengths)
    delta_n = refractive_index - 1.0
    wave_nos = 2.0 * np.pi / wave_lengths
    return (2.0 * np.pi) / (wave_nos * delta_n)
