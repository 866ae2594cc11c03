"""Compressed-sensing MRI with the fused masked-FFT prox.

Counterpart of /root/reference/examples/applications/csmri.py (there:
unet prior, 43.1 dB on the HF sample). Offline-safe via the synthetic
phantom + generated radial masks.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.contrib import csmri
from dprox_tpu.utils import metrics
from dprox_tpu.proxfn.pnp.hub import find_weights


def main():
    s = csmri.sample()
    x = dp.Variable()
    y = dp.Placeholder("y")
    mask = dp.Placeholder("mask", batch=False)
    data_term = dp.csmri(x, mask, y)
    # strongest offline prior: residual FFDNet + TV fusion — measured
    # +10.7 dB over the TV prior on this sample (weights/README.md)
    denoiser = "unet" if find_weights("unet-nm.pt") else "res_ffdnet_tv"
    reg_term = dp.deep_prior(x, denoiser=denoiser, sqrt=True)

    solver = dp.compile(data_term + reg_term, method="admm")
    rhos, sigmas = dp.log_descent(60, 15, 24, sigma=0.01)
    # real_output extracts the real part inside the solver executable
    # (complex buffers cannot cross executables on the axon backend)
    out = solver.solve(x0=s["x0"], rhos=rhos, lams=sigmas,
                       max_iter=24, params=s["params"], real_output=True)
    out = np.asarray(out)

    print(f"prior={denoiser}")
    print(f"zero-filled PSNR: {metrics.psnr(np.real(s['x0']), s['gt']):.2f} dB")
    print(f"solved      PSNR: {metrics.psnr(out, s['gt']):.2f} dB")


if __name__ == "__main__":
    main()
