"""Hyperspectral restoration suite: SISR, MISR, compressive sensing,
inpainting — one script per fused data-term prox.

Counterpart of /root/reference/examples/papers/dphsir_neurcomputing_2022/
{hsi_sisr,hsi_misr,hsi_compress_sensing,hsi_inpainting}.py, offline-safe
on a synthetic hyperspectral cube with the 3-D TV prior.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.proxfn.pnp.denoisers import TVDenoiser
from dprox_tpu.utils import imaging, metrics


def synthetic_hsi(bands=8, size=64):
    rgb = np.asarray(imaging.sample("face"))[0, :, :size, :size]
    ws = np.stack([np.abs([np.cos(0.2 * b), np.sin(0.15 * b) ** 2,
                           0.5 + 0.5 * np.cos(0.3 * b)]) for b in range(bands)])
    ws = ws / ws.sum(1, keepdims=True)
    return np.einsum("bc,chw->bhw", ws, rgb)[None].astype(np.float32), ws


PRIOR = "tv3d"  # or a registry key: "tiny_grunet", "tiny_grunet_tv", ...


def prior(x):
    if PRIOR == "tv3d":
        return dp.deep_prior(x, TVDenoiser(iter_num=10, use_3dtv=True),
                             sqrt=True)
    # trained 3-D deep prior (reference runs 'grunet' here,
    # hsi_deblur.py:30; the in-repo-trained key is 'tiny_grunet')
    return dp.deep_prior(x, PRIOR, sqrt=True)


def run(name, data_term, x0, gt, reg, iters=24):
    solver = dp.compile([data_term, reg], method="admm")
    rhos, sigmas = dp.log_descent(35, 10, iters)
    out = solver.solve(x0=x0, rhos=rhos, lams=sigmas, max_iter=iters)
    out_np = np.asarray(jnp.real(out))

    def hwc(t):
        return np.transpose(np.asarray(t)[0], (1, 2, 0))

    print(f"{name:12s} x0 mPSNR {metrics.mpsnr(hwc(x0), hwc(gt)):6.2f} dB -> "
          f"solved {metrics.mpsnr(hwc(out_np), hwc(gt)):6.2f} dB")


def main():
    cube, srf = synthetic_hsi()
    gt = jnp.asarray(cube)
    B = cube.shape[1]
    rng = np.random.RandomState(0)

    # --- deblur (Gaussian PSF per band, FFT x-update; reference
    #     hsi_deblur.py) ---
    psf_d = imaging.point_spread_function(9, 2)
    b_db = imaging.blurring(gt, psf_d)
    x = dp.Variable()
    run("deblur", dp.sum_squares(dp.conv(x, psf_d) - b_db), b_db, gt,
        prior(x))

    # --- SISR (x2, DPIR fused prox) ---
    psf = imaging.point_spread_function(7, 2)
    y, x0 = imaging.downsampling(gt, psf, 2)
    kernel = np.transpose(psf, (2, 0, 1))[None]
    x = dp.Variable()
    run("sisr", dp.sisr(x, dp.utils.array(np.asarray(y)),
                        dp.utils.array(kernel), 2), x0, gt, prior(x))

    # --- MISR (spectral response fusion) ---
    x = dp.Variable()
    z = np.asarray(gt).reshape(1, B, -1)
    b_misr = np.einsum("ck,nkp->ncp", srf.T, z).reshape(1, 3, *cube.shape[2:])
    x0 = jnp.asarray(np.repeat(b_misr.mean(1, keepdims=True), B, axis=1))
    run("misr", dp.misr(x, dp.utils.array(b_misr), srf), x0, gt, prior(x))

    # --- compressive sensing (coded aperture) ---
    x = dp.Variable()
    mask = (rng.rand(1, B, *cube.shape[2:]) > 0.5).astype(np.float32)
    y_cs = np.sum(np.asarray(gt) * mask, axis=1, keepdims=True)
    x0 = jnp.asarray(np.repeat(y_cs / max(B // 2, 1), B, axis=1))
    run("cs", dp.compress_sensing(x, dp.utils.array(mask),
                                  dp.utils.array(y_cs)), x0, gt, prior(x))

    # --- inpainting (spatially-diagonal direct solve) ---
    x = dp.Variable()
    m = (rng.rand(*cube.shape) > 0.3).astype(np.float32)
    b_inp = np.asarray(gt) * m
    data = dp.sum_squares(dp.mul_elementwise(x, m), b=dp.utils.array(b_inp))
    solver = dp.compile([data, prior(x)], method="admm")
    assert solver.least_square.diagonalizable  # spatial direct path
    run("inpainting", data, jnp.asarray(b_inp), gt, prior(x))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        PRIOR = sys.argv[1]
    print(f"prior: {PRIOR}")
    main()
