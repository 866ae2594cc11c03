from ..utils import imaging as restoration
from ..utils.imaging import (
    sample,
    point_spread_function,
    blurring,
    fspecial_gaussian,
    mosaicing,
    downsampling,
    masks_CFA_Bayer,
)
from ..utils.misc import to_ndarray

# reference-compat names (contrib/restoration.py exports both a numpy and
# a torch mosaicing; here one array-agnostic implementation serves both)
mosaicing_np = mosaicing
mosaicing_jax = mosaicing
from . import csmri
from . import optic
from . import derain
from . import energy_system
