"""Hybrid refractive-diffractive DOE model.

Counterpart of /root/reference/dprox/contrib/optic/doe_model_hybrid.py:
the DOE phase rides on top of a fixed refractive (Fresnel) lens phase,
with Sellmeier-derived refractive indices and an optional half-circular
aperture. All pure jnp; the learnable height map is an explicit param.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .doe_model import (FresnelPropagator, HeightMap, area_downsampling,
                        get_coordinate, img_psf_conv)


def sellmeier_fused_silica(wavelengths_m) -> np.ndarray:
    """Sellmeier refractive indices (reference: doe_model_hybrid.py:181-183)."""
    wvl_um = np.asarray(wavelengths_m) * 1e6
    return np.sqrt(
        1
        + 0.6961663 / (1 - (0.0684043 / wvl_um) ** 2)
        + 0.4079426 / (1 - (0.1162414 / wvl_um) ** 2)
        + 0.8974794 / (1 - (9.896161 / wvl_um) ** 2)
    )


@dataclasses.dataclass
class HybridDOEModelConfig:
    """(reference: doe_model_hybrid.py:184-197)"""

    circular: bool = True
    aperture_diameter: float = 9e-3
    aperture_type: str = "half_circular"  # or "circular"
    sensor_distance: float = 50e-3
    wave_lengths: tuple = (460e-9, 550e-9, 640e-9)
    num_steps: int = 10001
    patch_size: int = 512
    sample_interval: float = 5.4e-6
    wave_resolution: Tuple[int, int] = (1536, 1536)


class HybridRGBCollimator:
    """DOE + refractive lens imaging model
    (reference: doe_model_hybrid.py:74-180)."""

    def __init__(self, config: HybridDOEModelConfig):
        self.config = config
        wl = config.wave_lengths
        self.wave_res = config.wave_resolution
        self.wave_lengths = wl
        self.refractive_idcs = sellmeier_fused_silica(wl)
        self.patch_size = config.patch_size
        self.sensor_distance = config.sensor_distance

        self.input_field = np.ones((1, len(wl), *self.wave_res), np.float32)
        xx, yy = get_coordinate(self.wave_res[0], self.wave_res[1],
                                config.sample_interval, config.sample_interval)
        self.xx, self.yy = xx, yy
        r = np.sqrt(xx**2 + yy**2)
        if config.aperture_type == "half_circular":
            ap = ((yy > 0) & (r < xx.max())).astype(np.float32)
        else:
            ap = (r < xx.max()).astype(np.float32)
        self.aperture = ap[None, None]
        self.height_map = HeightMap(wl, self.refractive_idcs, xx, yy,
                                    config.sensor_distance)
        self.propagator = FresnelPropagator(
            (1, len(wl), *self.wave_res), config.sensor_distance,
            config.sample_interval, wl)
        self.refractive_len = self._refractive_len()

    def _refractive_len(self) -> np.ndarray:
        """Per-wavelength Fresnel-lens phase added under the DOE phase
        (reference: doe_model_hybrid.py:170-177)."""
        phases = []
        for wl in self.wave_lengths:
            k = 2 * np.pi / wl
            ph = -k * ((self.xx**2 + self.yy**2)[None, None]
                       / (2 * self.sensor_distance))
            phases.append(np.mod(ph, 2 * np.pi))
        return np.concatenate(phases, axis=1).astype(np.float32)

    def init_params(self) -> dict:
        return {"height_map_sqrt": self.height_map.fresnel_height_map_sqrt(1)}

    def get_phase_profile(self, params) -> jnp.ndarray:
        height_map = jnp.square(params["height_map_sqrt"] + 1e-7)
        phi = jnp.asarray(self.height_map.wave_nos * self.height_map.delta_N,
                          jnp.float32) * height_map
        phi = phi + self.refractive_len
        return jnp.exp(1j * phi)

    def get_psf(self, params: Optional[dict] = None,
                phase_profile: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if phase_profile is None:
            phase_profile = self.get_phase_profile(params)
        field = phase_profile * self.input_field
        field = self.aperture * field
        field = self.propagator(field)
        psfs = (jnp.abs(field) ** 2).astype(jnp.float32)
        psfs = area_downsampling(psfs, self.patch_size)
        return psfs / psfs.sum()

    def forward(self, input_img, params=None, phase_profile=None,
                circular: bool = False):
        psfs = self.get_psf(params, phase_profile)
        return img_psf_conv(input_img, psfs, circular=circular), psfs

    __call__ = forward


def build_hybrid_doe_model(config: HybridDOEModelConfig = HybridDOEModelConfig()):
    return HybridRGBCollimator(config)
