from .doe_model import (
    DOEModelConfig,
    HeightMap,
    RGBCollimator,
    FresnelPropagator,
    build_doe_model,
    build_baseline_height_map_sqrt,
    build_baseline_profile,
    img_psf_conv,
    area_downsampling,
    get_coordinate,
)
from .doe_model_hybrid import (
    HybridDOEModelConfig,
    HybridRGBCollimator,
    build_hybrid_doe_model,
    sellmeier_fused_silica,
)
from . import common
from .common import get_one_phase_shift_thickness
from .utils import (
    Dataset,
    SingleImageDataset,
    center_crop,
    load_sample_img,
    normalize_psf,
    normalize_psf2,
    plot,
    plot3d,
    sanity_check,
    subplot,
)
from ...models.optics_unet import OpticsUNet

# reference-compat name (dprox.contrib.optic.U_Net, optic/unet.py:44)
U_Net = OpticsUNet
from ...utils.misc import outlier_correct  # noqa: E402  (re-export parity)
# reference-compat re-exports (dprox/contrib/optic/__init__.py pulls
# Variable/conv_doe/psf2otf into its namespace; unet is its submodule)
from ...linop import Variable, conv_doe  # noqa: E402
from ...utils.fft import psf2otf  # noqa: E402
from ...models import optics_unet as unet  # noqa: E402
