"""Task-scale COLOR DEQ on noisy deconvolution (VERDICT r3 next #4).

The shipped weights/deq_deconv.msgpack — the flagship distilled color
prior finetuned THROUGH the ADMM equilibrium with learned global
(rho, lam) multipliers and noise-conditioned bases — must beat the
STRONGEST noise-adapted PnP schedule (best of the measured lam
multipliers, scripts/train_deq_deconv.py::pnp_psnr) at the SAME
24-iteration budget on every held-out hopper cell. Mirrors the gray
CSMRI DEQ family (reference: tests/paper/test_csmri.py:197-222).

Scope note (measured): on NOISELESS deconv a fixed-(rho, lam)
equilibrium saturates ~31 dB within the budget while annealed PnP
reaches 37 — the DEQ's domain is the noisy regime, like the CSMRI one.
"""
import os
import sys

import numpy as np
import pytest

from dprox_tpu.proxfn.pnp.hub import find_weights

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "scripts")))

needs_weights = pytest.mark.skipif(
    find_weights("deq_deconv.msgpack") is None,
    reason="deq_deconv weights not shipped")

# (heldout index, expected DEQ PSNR, expected PnP-baseline PSNR) —
# pinned on CPU from the r4 training run (TPU numbers within 0.3 dB)
DEQ_DECONV_GRID = [
    (0, 30.42, 30.04),  # psf 5, sn 0.01
    (1, 25.28, 24.13),  # psf 5, sn 0.02
    (3, 22.55, 21.95),  # psf 7, sn 0.03
]


@needs_weights
@pytest.mark.parametrize("idx,expected,expected_pnp", DEQ_DECONV_GRID)
def test_color_deq_beats_pnp_on_noisy_deconv(idx, expected, expected_pnp):
    from flax import serialization

    import train_deq_deconv as D

    deq, den = D.build_deq()
    params = deq.init_params()
    params["deq_prior"] = den.params
    path = os.path.join(os.path.dirname(__file__), "..", "..", "weights",
                        "deq_deconv.msgpack")
    with open(path, "rb") as f:
        params = serialization.from_bytes(params, f.read())

    prob = D.heldout_problems()[idx]
    pnp = D.pnp_psnr(prob)
    dq = D.deq_psnr(deq, prob, params)
    assert pnp == pytest.approx(expected_pnp, abs=0.2), pnp
    assert dq == pytest.approx(expected, abs=0.2), dq
    assert dq > pnp, (dq, pnp)
