"""DOE (diffractive optical element) physics for end-to-end optics co-design.

Counterpart of /root/reference/dprox/contrib/optic/{doe_model,common}.py.
All wave-optics math (phase profiles, Fresnel transfer function, PSF
simulation) is pure jnp — the learnable height map is an explicit param
pytree so bi-level training (DOE + unrolled solver hyperparameters)
differentiates through PSF simulation, the conv_doe data term, and the
solver in one jitted graph. The heavy ops are 1496^2 batched FFTs —
XLA-friendly and MXU/VPU bound.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def get_coordinate(nx: int, ny: int, dx: float, dy: float):
    """Centered grid coordinates (reference: common.py:9-24)."""
    x = (np.arange(nx) - (nx - 1.0) / 2) * dx
    y = (np.arange(ny) - (ny - 1.0) / 2) * dy
    xx, yy = np.meshgrid(x, y, indexing="ij")
    return xx.astype(np.float32), yy.astype(np.float32)


def area_downsampling(x: jnp.ndarray, target_side: int) -> jnp.ndarray:
    """Block-mean downsample [B,C,H,W] to target side (common.py:27-44)."""
    H = x.shape[2]
    if H % target_side:
        raise NotImplementedError("wave resolution must divide patch size")
    f = H // target_side
    B, C = x.shape[:2]
    x = x.reshape(B, C, target_side, f, target_side, f)
    return x.mean(axis=(3, 5))


def psf2otf_4d(psf: jnp.ndarray, out_hw) -> jnp.ndarray:
    """[B,C,fh,fw] PSF -> OTF at out_hw (common.py:47-83 semantics)."""
    from ...utils.fft import psf2otf_traced

    return psf2otf_traced(psf, out_hw)


def img_psf_conv(img: jnp.ndarray, psf: jnp.ndarray, circular: bool = True) -> jnp.ndarray:
    """FFT convolution of image with simulated PSF (common.py:85-118)."""
    if not circular:
        H, W = img.shape[2], img.shape[3]
        ph, pw = H / 2, W / 2
        top, bottom = int(np.ceil(ph)), int(np.floor(ph))
        left, right = int(np.ceil(pw)), int(np.floor(pw))
        img = jnp.pad(img, ((0, 0), (0, 0), (top, bottom), (left, right)))
    otf = psf2otf_4d(psf, img.shape[-2:])
    result = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(img) * otf))
    if not circular:
        result = result[:, :, top:-bottom, left:-right]
    return result


@dataclasses.dataclass
class DOEModelConfig:
    """(reference: doe_model.py:156-168)"""

    circular: bool = True
    aperture_diameter: float = 3e-3
    sensor_distance: float = 15e-3
    refractive_idcs: tuple = (1.4648, 1.4599, 1.4568)
    wave_lengths: tuple = (460e-9, 550e-9, 640e-9)
    num_steps: int = 10001
    patch_size: int = 748
    sample_interval: float = 2e-6
    wave_resolution: Tuple[int, int] = (1496, 1496)


class HeightMap:
    """Height-map <-> phase math (reference: doe_model.py:5-70).

    The learnable quantity is height_map_sqrt (squared to stay positive);
    it lives in the user's param pytree, initialized to a Fresnel lens.
    """

    def __init__(self, wave_lengths, refractive_idcs, xx, yy, sensor_distance):
        self.wave_lengths = np.asarray(wave_lengths, np.float64)
        self.refractive_idcs = np.asarray(refractive_idcs, np.float64)
        self.delta_N = (self.refractive_idcs - 1.0).reshape(1, -1, 1, 1)
        self.wave_nos = (2.0 * np.pi / self.wave_lengths).reshape(1, -1, 1, 1)
        self.xx, self.yy = xx, yy
        self.sensor_distance = sensor_distance

    def fresnel_height_map_sqrt(self, idx: int = 1) -> jnp.ndarray:
        k = 2 * np.pi / self.wave_lengths[idx]
        fresnel_phase = -k * ((self.xx**2 + self.yy**2)[None, None]
                              / (2 * self.sensor_distance))
        fresnel_phase = np.mod(fresnel_phase, 2 * np.pi)
        hm = self.phase_to_height_map(fresnel_phase, idx)
        return jnp.asarray(np.sqrt(hm), jnp.float32)

    def phase_to_height_map(self, phi, wave_length_idx: int = 1):
        wave_length = self.wave_lengths[wave_length_idx]
        delta_n = self.delta_N.ravel()[wave_length_idx]
        k = 2.0 * np.pi / wave_length
        phi = phi % (2 * np.pi)
        return phi / k / delta_n

    def get_phase_profile(self, height_map_sqrt: jnp.ndarray) -> jnp.ndarray:
        if jnp.iscomplexobj(height_map_sqrt):
            raise TypeError(
                "height_map_sqrt must be real (got complex — a phase "
                "profile? pass it as get_psf(phase_profile=...) instead)")
        height_map = jnp.square(height_map_sqrt)
        phi = jnp.asarray(self.wave_nos * self.delta_N, jnp.float32) * height_map
        return jnp.exp(1j * phi.astype(jnp.float32))


class FresnelPropagator:
    """Padded transfer-function Fresnel propagation
    (reference: common.py:122-164). H is precomputed host-side."""

    def __init__(self, input_shape, distance, discretization_size, wave_lengths):
        _, C, M_orig, N_orig = input_shape
        Mpad, Npad = M_orig // 4, N_orig // 4
        self.Mpad, self.Npad = Mpad, Npad
        M, N = M_orig + 2 * Mpad, N_orig + 2 * Npad
        xx, yy = get_coordinate(M, N, 1, 1)
        fx = xx / (discretization_size * N)
        fy = yy / (discretization_size * M)
        fx = np.fft.ifftshift(fx)
        fy = np.fft.ifftshift(fy)
        sq = (fx**2 + fy**2)[None, None]
        wl = np.asarray(wave_lengths).reshape(1, -1, 1, 1)
        phi = -np.pi * distance * wl * sq
        self.H = np.exp(1j * phi).astype(np.complex64)

    def __call__(self, field: jnp.ndarray) -> jnp.ndarray:
        Mpad, Npad = self.Mpad, self.Npad
        padded = jnp.pad(field, ((0, 0), (0, 0), (Mpad, Mpad), (Npad, Npad)))
        out = jnp.fft.ifft2(jnp.fft.fft2(padded) * self.H)
        return out[:, :, Mpad:-Mpad, Npad:-Npad]


class RGBCollimator:
    """DOE imaging model: phase profile x aperture -> Fresnel propagation
    -> |field|^2 -> area downsample -> normalized PSF
    (reference: doe_model.py:73-153)."""

    def __init__(self, sensor_distance, refractive_idcs, wave_lengths,
                 patch_size, sample_interval, wave_resolution):
        self.wave_res = wave_resolution
        self.wave_lengths = wave_lengths
        self.sensor_distance = sensor_distance
        self.sample_interval = sample_interval
        self.patch_size = patch_size
        self.refractive_idcs = refractive_idcs

        self.input_field = np.ones((1, len(wave_lengths), *wave_resolution),
                                   np.float32)
        xx, yy = get_coordinate(wave_resolution[0], wave_resolution[1],
                                sample_interval, sample_interval)
        self.xx, self.yy = xx, yy
        r = np.sqrt(xx**2 + yy**2)
        self.aperture = (r < xx.max()).astype(np.float32)[None, None]
        self.height_map = HeightMap(wave_lengths, refractive_idcs, xx, yy,
                                    sensor_distance)
        self.propagator = FresnelPropagator(
            (1, len(wave_lengths), *wave_resolution), sensor_distance,
            sample_interval, wave_lengths)

    def init_params(self) -> dict:
        return {"height_map_sqrt": self.height_map.fresnel_height_map_sqrt(1)}

    def get_psf(self, params: Optional[dict] = None,
                phase_profile: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if phase_profile is None:
            phase_profile = self.height_map.get_phase_profile(
                params["height_map_sqrt"])
        field = phase_profile * self.input_field
        field = self.aperture * field
        field = self.propagator(field)
        psfs = (jnp.abs(field) ** 2).astype(jnp.float32)
        psfs = area_downsampling(psfs, self.patch_size)
        return psfs / psfs.sum()

    def forward(self, input_img, params: Optional[dict] = None,
                phase_profile=None, circular: bool = False):
        psfs = self.get_psf(params, phase_profile)
        return img_psf_conv(input_img, psfs, circular=circular), psfs

    __call__ = forward


def build_doe_model(config: DOEModelConfig = DOEModelConfig()) -> RGBCollimator:
    """(reference: doe_model.py:171-188)"""
    return RGBCollimator(config.sensor_distance,
                         refractive_idcs=config.refractive_idcs,
                         wave_lengths=config.wave_lengths,
                         patch_size=config.patch_size,
                         sample_interval=config.sample_interval,
                         wave_resolution=config.wave_resolution)


def build_baseline_height_map_sqrt(model: RGBCollimator) -> np.ndarray:
    """sqrt height map of the Fresnel-lens baseline, as REAL host-side
    numpy — TPU-safe input for a jitted ``get_psf`` (eager complex ops
    are unimplemented on the axon backend; form exp(i*phi) in-graph)."""
    hm = model.height_map
    k = 2 * np.pi / np.asarray(model.wave_lengths)[1]
    fresnel_phase = -k * ((model.xx**2 + model.yy**2)[None, None]
                          / (2 * model.sensor_distance))
    fresnel_phase = np.mod(fresnel_phase, 2 * np.pi)
    height_map = hm.phase_to_height_map(fresnel_phase, 1)
    return np.sqrt(np.asarray(height_map, np.float32))


def build_baseline_profile(model: RGBCollimator) -> jnp.ndarray:
    """Fresnel-lens baseline phase profile (reference: doe_model.py:191-209)."""
    return model.height_map.get_phase_profile(
        jnp.asarray(build_baseline_height_map_sqrt(model)))
