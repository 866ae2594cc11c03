from .prior import deep_prior, get_denoiser
from .denoisers import (
    Denoiser,
    Denoiser2D,
    FFDNetDenoiser,
    FFDNetColorDenoiser,
    DRUNetDenoiser,
    IRCNNDenoiser,
    UNetDenoiser,
    TVDenoiser,
    Augment,
    DeepTVDenoiser,
)
