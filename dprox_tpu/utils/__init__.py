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

# reference-compat aliases: dprox.utils.fft2/ifft2 are the centered
# orthonormal transforms (reference utils/misc.py:167-195)
fft2 = fft2_center
ifft2 = ifft2_center
from . import metrics
from .metrics import mse, psnr, ssim, sam, ergas, mpsnr, mssim, mpsnr_max
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
from .io import imread, imread_rgb, imshow, filter_ckpt, is_image_file, list_image_files
from . import init
from .init import demosaic_bilinear, demosaic_ea, demosaic_from_mosaiced, demosaic_malvar, shift_pixel
from . import hub
from .hub import load_path, load_checkpoint, download_dataset

# reference-compat alias (dprox.utils.hf / dprox.utils.huggingface)
hf = hub
huggingface = hub
from . import profiling
from .profiling import Timer, IterationTimer, trace
from . import checkpoint
from .checkpoint import save_pytree, load_pytree
