from .misc import (
    array,
    to_jax_array,
    to_ndarray,
    debatchify,
    safe_sqrt,
    seed_everything,
    expand_to_bchw,
    outlier_correct,
    crop_center_region,
)
from .fft import fft2_center, ifft2_center, psf2otf, psf2otf_traced
from . import metrics
from . import imaging
from .imaging import (
    sample,
    point_spread_function,
    fspecial_gaussian,
    blurring,
    mosaicing,
    downsampling,
    masks_CFA_Bayer,
    bayer_mask,
)
from . import io
from .io import imread, imshow, filter_ckpt, list_image_files
from . import init
from .init import demosaic_bilinear, demosaic_from_mosaiced, demosaic_malvar, shift_pixel
from . import hub
from .hub import load_path, load_checkpoint, download_dataset
from . import profiling
from .profiling import Timer, IterationTimer, trace
from . import checkpoint
from .checkpoint import save_pytree, load_pytree
