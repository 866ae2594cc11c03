"""Concrete linear operators: conv, conv_doe, grad, mosaic, mul, blackbox.

TPU-native counterparts of /root/reference/dprox/linop/{conv,grad,subsample,
mul,blackbox}.py. Circular convolutions are executed as FFT pointwise
multiplies (XLA lowers batched 2-D FFTs efficiently on TPU); OTFs of static
kernels are precomputed host-side and closed over as compile-time constants,
while learned/injected PSFs (DOE co-design) stay traced via Placeholders.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from ..utils.fft import psf2otf, psf2otf_traced
from .base import LinOp, Placeholder, Params, Array


def _fftn2(x):
    return jnp.fft.fftn(x, axes=(-2, -1))


def _ifftn2(x):
    return jnp.fft.ifftn(x, axes=(-2, -1))


class conv(LinOp):
    """Circular convolution with a static kernel via FFT.

    forward: x -> real(ifft2(OTF * fft2(x))); adjoint multiplies by
    conj(OTF). Frequency-diagonal (reference: conv.py:15-56).
    """

    def __init__(self, arg, kernel):
        super().__init__([arg])
        self.kernel = np.asarray(kernel, dtype=np.float32)
        self._otf_cache = {}

    def _otf(self, shape) -> np.ndarray:
        """OTF as [1,C,H,W] complex64, cached per static shape.

        Cached as a *numpy* constant: caching a jnp array created inside
        a jit/scan trace would leak tracers across traces.
        """
        key = tuple(shape[-3:])
        if key not in self._otf_cache:
            C, H, W = key
            # kernel passed as-is: blind squeezing would destroy the
            # orientation of axis-aligned kernels like grad's (1,2,1)
            kernel = self.kernel
            if kernel.ndim == 2:
                pass  # HW -> padded to HWC by psf2otf
            otf = psf2otf(kernel, (H, W, C))  # HWC
            otf = np.transpose(otf, (2, 0, 1))[None]  # 1CHW
            self._otf_cache[key] = np.asarray(otf, np.complex64)
        return self._otf_cache[key]

    # NOTE: rfft half-spectrum variants were measured SLOWER than full
    # complex FFTs on TPU v5e (0.034ms vs 0.026ms round trip @512^2) —
    # the backend lowers rfft via a full FFT plus slicing. Keep full FFTs.
    def _forward(self, child_values, params):
        x = child_values[0]
        FB = self._otf(x.shape)
        out = _ifftn2(FB * _fftn2(x))
        if jnp.iscomplexobj(x):
            return out
        return jnp.real(out).astype(x.dtype)

    def _adjoint(self, y, params):
        FB = self._otf(y.shape)
        out = _ifftn2(jnp.conj(FB) * _fftn2(y))
        if jnp.iscomplexobj(y):
            return [out]
        return [jnp.real(out).astype(y.dtype)]

    def is_diag(self, freq: bool = False) -> bool:
        return freq and self.children[0].is_diag(freq)

    def diag(self, shape, params=None, freq: bool = False):
        assert freq
        return self._otf(shape)

    def gram_diag(self, shape, params=None, freq: bool = False):
        FB = self._otf(shape)
        return jnp.abs(jnp.conj(FB) * FB)

    def _own_gram_surrogate(self, shape, params=None):
        return self.gram_diag(shape, params, freq=True)

    def norm_bound(self, input_mags):
        return float(np.max(np.abs(self.kernel))) * input_mags[0]


class grad(conv):
    """Finite-difference gradient as circular conv with [1,-1].

    dim: 0 = height, 1 = width, 2 = channel (reference: grad.py:8-46).
    """

    def __init__(self, arg, dim: int = 1):
        if dim not in (0, 1, 2):
            raise ValueError("dim must be 0 (H), 1 (W) or 2 (C)")
        D = np.array([1.0, -1.0], dtype=np.float32).reshape(1, 1, 2)
        D = np.swapaxes(D, dim, -1)
        super().__init__(arg, kernel=D)
        self.dim = dim

    def norm_bound(self, input_mags):
        return 2.0 * input_mags[0]


class conv_doe(LinOp):
    """Circular/linearized convolution with a learned or injected PSF.

    The PSF arrives either as a Placeholder (value in ``params``, traced
    and differentiable — the DOE bi-level-training path) or a fixed array.
    (reference: conv.py:83-156.)
    """

    def __init__(self, arg, psf, circular: bool = True):
        super().__init__([arg])
        self.circular = circular
        if isinstance(psf, Placeholder):
            self._psf_ph = psf
            self._psf_val = None
        else:
            self._psf_ph = None
            self._psf_val = jnp.asarray(psf)
            if self._psf_val.ndim == 3:
                self._psf_val = self._psf_val[None]

    def psf(self, params: Optional[Params]):
        if self._psf_ph is not None:
            p = self._psf_ph.value(params)
        else:
            p = self._psf_val
        if p.ndim == 3:
            p = p[None]
        return p

    @staticmethod
    def _pads(H):
        target = 2 * H
        pad = (target - H) / 2
        return int(np.ceil(pad)), int(np.floor(pad))

    def _apply(self, img, params, conj_otf: bool):
        psf = self.psf(params)
        if not self.circular:
            top, bottom = self._pads(img.shape[2])
            left, right = self._pads(img.shape[3])
            img = jnp.pad(img, ((0, 0), (0, 0), (top, bottom), (left, right)))
        otf = psf2otf_traced(psf, img.shape[-2:])
        if conj_otf:
            otf = jnp.conj(otf)
        out = jnp.real(_ifftn2(otf * _fftn2(img))).astype(jnp.float32)
        if not self.circular:
            out = out[:, :, top:-bottom, left:-right]
        return out

    def _forward(self, child_values, params):
        return self._apply(child_values[0], params, conj_otf=False)

    def _adjoint(self, y, params):
        return [self._apply(y, params, conj_otf=True)]

    def is_diag(self, freq: bool = False) -> bool:
        return freq and self.circular and self.children[0].is_diag(freq)

    def diag(self, shape, params=None, freq: bool = False):
        assert freq
        return psf2otf_traced(self.psf(params), shape[-2:])

    def gram_diag(self, shape, params=None, freq: bool = False):
        otf = psf2otf_traced(self.psf(params), shape[-2:])
        return jnp.abs(jnp.conj(otf) * otf)

    def _own_gram_surrogate(self, shape, params=None):
        # circular: exact; linearized: the circulant part (still a valid
        # SPD preconditioner)
        return self.gram_diag(shape, params, freq=True)


class mosaic(LinOp):
    """Bayer RGGB masking; self-adjoint, spatially diagonal.

    (reference: subsample.py:8-99.)
    """

    def __init__(self, arg):
        super().__init__([arg])
        self._mask_cache = {}

    def mask(self, shape) -> np.ndarray:
        # cached as numpy to avoid leaking tracers across jit traces
        key = tuple(shape[-2:])
        if key not in self._mask_cache:
            from ..utils.imaging import bayer_mask

            self._mask_cache[key] = np.asarray(bayer_mask(key), np.float32)
        return self._mask_cache[key]

    def _forward(self, child_values, params):
        x = child_values[0]
        return self.mask(x.shape) * x

    def _adjoint(self, y, params):
        return [self.mask(y.shape) * y]

    def is_diag(self, freq: bool = False) -> bool:
        return (not freq) and self.children[0].is_diag(freq)

    def is_gram_diag(self, freq: bool = False) -> bool:
        return (not freq) and self.children[0].is_gram_diag(freq)

    def diag(self, shape, params=None, freq: bool = False):
        assert not freq
        return self.mask(shape)

    def gram_diag(self, shape, params=None, freq: bool = False):
        assert not freq
        return self.mask(shape)  # mask is 0/1 so mask^2 == mask

    def _own_gram_surrogate(self, shape, params=None):
        # spatial average per channel: the circulant surrogate of the
        # Bayer mask (R 1/4, G 1/2, B 1/4) — keeps channel structure
        m = jnp.asarray(self.mask(shape))
        return jnp.mean(m, axis=(-2, -1), keepdims=True)

    def norm_bound(self, input_mags):
        return input_mags[0]


class mul_color(LinOp):
    """Spectral-response color-matrix multiply: y = srf^T x over channels.

    srf: [C_in, C_out]; used by multispectral SR (reference: mul.py:13-43).
    """

    def __init__(self, arg, srf):
        super().__init__([arg])
        if isinstance(srf, Placeholder):
            self._srf_ph, self._srf_val = srf, None
        else:
            self._srf_ph, self._srf_val = None, jnp.asarray(srf, jnp.float32)

    def srf(self, params):
        if self._srf_ph is not None:
            return jnp.asarray(self._srf_ph.value(params))
        return self._srf_val

    def _forward(self, child_values, params):
        x = child_values[0]  # B,Cin,H,W
        srf = self.srf(params)
        srf = srf.reshape(srf.shape[0], srf.shape[1]) if srf.ndim > 2 else srf
        return jnp.einsum("bchw,co->bohw", x, srf)

    def _adjoint(self, y, params):
        srf = self.srf(params)
        srf = srf.reshape(srf.shape[0], srf.shape[1]) if srf.ndim > 2 else srf
        return [jnp.einsum("bohw,co->bchw", y, srf)]


class mul_elementwise(LinOp):
    """Elementwise multiply by a fixed/injected weight; diagonal (spatial).

    (reference: mul.py:46-73.)
    """

    def __init__(self, arg, weight):
        super().__init__([arg])
        if isinstance(weight, Placeholder):
            self._w_ph, self._w_val = weight, None
        else:
            self._w_ph, self._w_val = None, jnp.asarray(weight, jnp.float32)

    def weight(self, params):
        if self._w_ph is not None:
            return self._w_ph.value(params)
        return self._w_val

    def _forward(self, child_values, params):
        return self.weight(params) * child_values[0]

    def _adjoint(self, y, params):
        return [self.weight(params) * y]

    def is_diag(self, freq: bool = False) -> bool:
        return (not freq) and self.children[0].is_diag(freq)

    def is_gram_diag(self, freq: bool = False) -> bool:
        return (not freq) and self.children[0].is_gram_diag(freq)

    def diag(self, shape, params=None, freq: bool = False):
        assert not freq
        return self.weight(params)

    def gram_diag(self, shape, params=None, freq: bool = False):
        assert not freq
        w = self.weight(params)
        return w * w

    def _own_gram_surrogate(self, shape, params=None):
        w = self.weight(params)
        return jnp.mean(w * w, axis=(-2, -1), keepdims=True)


class BlackBox(LinOp):
    """User-supplied forward/adjoint closures (reference: blackbox.py:4-78).

    Closures receive ``(x, params, step)`` where ``step`` is the traced
    iteration index set by the running algorithm — enabling step-dependent
    learned operators (e.g. derain's LearnableDegOp). A ``diag_fn`` opt-in
    enables direct diagonal solves.
    """

    def __init__(self, arg, forward_fn: Callable, adjoint_fn: Callable,
                 diag_fn: Optional[Callable] = None, freq_diag: bool = False,
                 norm_bound_val: float = 1.0):
        super().__init__([arg])
        self.forward_fn = forward_fn
        self.adjoint_fn = adjoint_fn
        self.diag_fn = diag_fn
        self.freq_diag = freq_diag
        self.norm_bound_val = norm_bound_val

    @staticmethod
    def _step(params):
        if params is not None and "__step__" in params:
            return params["__step__"]
        return 0

    def _forward(self, child_values, params):
        return self.forward_fn(child_values[0], params=params, step=self._step(params))

    def _adjoint(self, y, params):
        return [self.adjoint_fn(y, params=params, step=self._step(params))]

    def is_diag(self, freq: bool = False) -> bool:
        return (self.diag_fn is not None and freq == self.freq_diag
                and self.children[0].is_diag(freq))

    def is_gram_diag(self, freq: bool = False) -> bool:
        return self.is_diag(freq)

    def diag(self, shape, params=None, freq: bool = False):
        assert self.diag_fn is not None
        return self.diag_fn(shape, params=params, step=self._step(params))

    def norm_bound(self, input_mags):
        return self.norm_bound_val * input_mags[0]


def LinOpFactory(forward, adjoint, diag=None, freq_diag=False, norm_bound=1.0):
    """Build a BlackBox-constructing closure (reference: blackbox.py:4-10).

    ``freq_diag=True`` declares the operator frequency-diagonal and routes
    x-updates through the closed-form FFT division. The large-plane
    half-spectrum (rfft) fast path additionally assumes the spectrum comes
    from a REAL kernel and a REAL offset (conj-symmetric numerator,
    even-symmetric gram diagonal). Return a real ``diag`` (|H|^2-style)
    for full speed; a complex ``diag`` is detected and served by the
    always-exact full-complex path instead (see
    proxfn/sum_squares.py::_freq_xupdate).
    """

    def build(arg):
        return BlackBox(arg, forward, adjoint, diag, freq_diag, norm_bound)

    return build
