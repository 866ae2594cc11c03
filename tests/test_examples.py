"""Smoke tier: every example script runs end-to-end at toy scale.

The reference ships examples that are exercised only manually (SURVEY
§4 notes no CI); here each example's main() is importable with scale
parameters so this tier keeps them green on the CPU mesh.
"""
import importlib.util
import os
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def load_example(rel):
    path = os.path.join(ROOT, "examples", rel)
    name = "example_" + os.path.splitext(os.path.basename(rel))[0]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_pnp_optics_smoke(capsys):
    load_example("papers/pnp_optics.py").main(patch=32, max_iter=3)
    out = capsys.readouterr().out
    assert "output PSNR" in out


def test_e2e_optics_unet_smoke(capsys):
    load_example("papers/e2e_optics_unet.py").main(steps=2, patch=32)
    out = capsys.readouterr().out
    assert "output PSNR" in out


def test_e2e_optics_joint_smoke(capsys):
    load_example("papers/e2e_optics_joint.py").main(steps=2, patch=32,
                                                    max_iter=2)
    out = capsys.readouterr().out
    assert "step 1" in out and "nan" not in out


def test_csmri_unroll_smoke(capsys):
    load_example("papers/csmri_unroll.py").main(train_steps=3)
    out = capsys.readouterr().out
    assert "unrolled (trained) PSNR" in out


def test_dpir_demosaic_smoke(capsys):
    psnr = load_example("papers/dpir_demosaic.py").main(iters=2)
    assert psnr > 20.0


def test_stochastic_energy_planning_smoke(capsys):
    load_example("applications/stochastic_energy_planning.py").main(
        n_periods=12, n_tech=3, n_scenarios=8, use_mesh=True, max_outer=20)
    out = capsys.readouterr().out
    assert "consensus capacity plan" in out
    assert "extensive-form optimum" in out


def test_shipped_weight_demos(capsys):
    """The trained-artifact demos appended to the derain / e2e_optics /
    csmri_deq examples run against the shipped weights (r3)."""
    load_example("applications/derain.py").shipped_weights_demo()
    load_example("papers/e2e_optics.py").shipped_weights_demo()
    load_example("papers/csmri_deq.py").shipped_weights_demo()
    out = capsys.readouterr().out
    assert "trained pipeline" in out
    assert "co-designed" in out
    assert "trained DEQ" in out
