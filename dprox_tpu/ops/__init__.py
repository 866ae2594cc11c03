from .pallas_kernels import fused_admm_update, freq_divide, bdot_pallas
