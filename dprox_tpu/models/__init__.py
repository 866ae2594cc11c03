from .ffdnet import FFDNet, FFDNet3D
from .dncnn import DnCNN, FDnCNN, IRCNN
from .drunet import UNetRes
from .unet import UNet
from .optics_unet import OpticsUNet, pad_to_ratio_of_32, unpad_from_ratio_of_32
from .tv import tv_denoising, tv_denoising3d
from .dgu import DGUDenoiser
from .qrnn import GRUnet, QRNNREDC3D
from .convert import load_torch_state_dict, torch_to_flax, fold_batchnorm
