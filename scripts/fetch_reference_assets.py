"""One-command fetch of the reference's pretrained weights + eval data.

Downloads the HuggingFace assets the reference-golden tests key on
(tests/test_golden.py -k reference_weights) into ~/.cache/dprox using
the same hub layout as the reference
(/root/reference/dprox/utils/huggingface.py:36-93). Requires network
egress — in the offline build environment every fetch fails and the
goldens stay skipped.

Usage:
    python scripts/fetch_reference_assets.py            # all
    python scripts/fetch_reference_assets.py --weights  # weights only
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

WEIGHTS = [
    "pnp_denoisers/ffdnet_color.pth",
    "pnp_denoisers/ffdnet_gray.pth",
    "pnp_denoisers/drunet_color.pth",
    "pnp_denoisers/drunet_gray.pth",
    "pnp_denoisers/ircnn_gray.pth",
    "pnp_denoisers/unet-nm.pt",
    "pnp_denoisers/unet_qrnn3d.pth",
]
DATA = [
    "data/csmri/masks/radial_128_2.mat",
    "data/csmri/Medical_128/Bust.jpg",
]


def main(weights=True, data=True):
    from dprox_tpu.utils import hub

    hub.set_download_enabled(True)
    ok, fail = [], []
    todo = (WEIGHTS if weights else []) + (DATA if data else [])
    for rel in todo:
        repo_type = "datasets" if rel.startswith("data/") else "models"
        try:
            p = hub.load_path(rel, repo_type=repo_type, raise_on_miss=True)
            ok.append((rel, p))
            print(f"[ok]   {rel} -> {p}")
        except Exception as e:
            fail.append((rel, str(e)))
            print(f"[fail] {rel}: {e}")
    # the real face image used by the deconv goldens comes from scipy's
    # pooch-backed dataset cache
    try:
        import scipy.datasets

        scipy.datasets.face()
        print("[ok]   scipy face dataset cached")
    except Exception as e:
        print(f"[fail] scipy face dataset: {e}")
    print(f"{len(ok)} fetched, {len(fail)} failed")
    if ok:
        print("reference goldens now active: "
              "python -m pytest tests/test_golden.py -k reference_weights")
    return 0 if not fail else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", action="store_true")
    ap.add_argument("--data", action="store_true")
    a = ap.parse_args()
    both = not (a.weights or a.data)
    raise SystemExit(main(weights=a.weights or both, data=a.data or both))
