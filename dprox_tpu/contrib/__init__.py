from ..utils import imaging as restoration
from ..utils.imaging import (
    sample,
    point_spread_function,
    blurring,
    mosaicing,
    downsampling,
    masks_CFA_Bayer,
)
from . import csmri
from . import optic
from . import derain
from . import energy_system
