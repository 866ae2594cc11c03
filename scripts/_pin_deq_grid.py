"""Ad-hoc: compute the DEQ grid-cell PSNRs for golden re-pinning."""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
from flax import serialization

import dprox_tpu as dp
from dprox_tpu.contrib import csmri
from dprox_tpu.proxfn.pnp.prior import get_denoiser
from dprox_tpu.utils import metrics

path = os.path.join(os.path.dirname(__file__), "..", "weights",
                    "deq_csmri.msgpack")
den = get_denoiser("distilled_gray")
x = dp.Variable()
y = dp.Placeholder("y")
mask = dp.Placeholder("mask", batch=False)
reg = dp.deep_prior(x, den, sqrt=True, param_key="deq_prior")
solver = dp.compile(dp.csmri(x, mask, y) + reg, method="admm")
deq = dp.specialize(solver, method="deq", learned_params=True,
                    f_thres=24, b_thres=16)
params = {"deq_r": np.float32(1.0), "deq_l": np.float32(1.0),
          "deq_prior": den.params}
with open(path, "rb") as f:
    params = serialization.from_bytes(params, f.read())

for num_lines, sigma in ((50, 0.0), (40, 0.05)):
    s = csmri.generate_sample(size=128, num_lines=num_lines, sigma=sigma)
    p = dict(params)
    p.update(s["params"])
    out = deq.solve(x0=np.real(s["x0"]).astype(np.float32), rhos=0.3,
                    lams=0.05, params=p, real_output=True)
    psnr = metrics.psnr(np.asarray(out), s["gt"])
    print(f"cell ({num_lines}, {sigma}): {psnr:.3f} dB", flush=True)
