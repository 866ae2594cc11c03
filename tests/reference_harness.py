"""Import harness for the reference Delta-Prox implementation.

Loads /root/reference/dprox (PyTorch) on CPU with its missing optional
dependencies stubbed out, so tests can cross-check dprox_tpu numerics
directly against the reference on identical inputs. Returns None when
the reference (or torch) is unavailable.
"""
import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


def _stub(name, **attrs):
    # Never shadow a genuinely-installed package: a bare stub in
    # sys.modules (no __file__) breaks later real imports in OTHER test
    # files (e.g. matplotlib's grace_hopper sample in test_pnp.py).
    if not attrs:
        import importlib.util
        try:
            if importlib.util.find_spec(name) is not None:
                return sys.modules.get(name)
        except (ImportError, ValueError):
            pass
    m = types.ModuleType(name)
    m.__path__ = []
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_loaded = None


def load_reference():
    """Import and return the reference ``dprox`` module (or None)."""
    global _loaded
    if _loaded is not None:
        return _loaded
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    def _psnr(a, b, data_range=1.0):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        mse = np.mean((a - b) ** 2)
        return 10 * np.log10(data_range**2 / mse)

    _stub("skimage")
    _stub("skimage.metrics", structural_similarity=lambda *a, **k: 0.0,
          peak_signal_noise_ratio=_psnr)
    for name in ["imageio", "matplotlib", "matplotlib.pyplot", "cv2",
                 "huggingface_hub", "munch", "graphviz"]:
        _stub(name)
    class _Anything(types.ModuleType):
        """Module stub that manufactures attributes on demand."""

        def __getattr__(self, item):
            if item.startswith("__"):
                raise AttributeError(item)
            return type(item, (), {"__init__": lambda self, *a, **k: None})

    for name in ["torchlight", "torchlight.nn", "torchlight.data",
                 "torchlight.utils", "torchlight.nn.utils", "torchlights",
                 "tfpnp", "tfpnp.data", "tfpnp.data.util", "tfpnp.data.batch",
                 "tfpnp.utils", "tfpnp.utils.misc", "tfpnp.policy",
                 "tfpnp.policy.network", "tfpnp.policy.sync_batchnorm",
                 "tfpnp.trainer", "tfpnp.env", "tfpnp.eval", "tfpnp.pnp",
                 "munch"]:
        m = _Anything(name)
        m.__path__ = []
        sys.modules[name] = m

    # scipy>=1.12 removed scipy.misc.face/ascent; give the reference a
    # deterministic synthetic sample (the same one dprox_tpu uses, so both
    # frameworks see identical inputs)
    import scipy
    import scipy.misc  # noqa: F401  (module exists but is empty)

    from dprox_tpu.utils.imaging import _synthetic_face

    face = (_synthetic_face(512, 512) * 255).astype(np.uint8)
    scipy.misc.face = lambda gray=False: face
    scipy.misc.ascent = lambda: face.mean(-1).astype(np.uint8)
    if not hasattr(scipy, "finfo"):
        scipy.finfo = np.finfo

    try:
        import dprox  # noqa: F401

        _loaded = dprox
    except Exception as e:  # pragma: no cover
        print(f"reference unavailable: {type(e).__name__}: {e}")
        _loaded = None
    return _loaded
