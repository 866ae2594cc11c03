from .doe_model import (
    DOEModelConfig,
    HeightMap,
    RGBCollimator,
    FresnelPropagator,
    build_doe_model,
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
from .utils import load_sample_img, sanity_check, normalize_psf, center_crop
