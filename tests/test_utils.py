"""Unit tests for utilities: visualize, io, hub, init, equil, metrics."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import dprox_tpu as dp
from dprox_tpu.utils import imaging, metrics


def test_visualize_text_and_dot():
    x = dp.Variable(name="x")
    op = 2.0 * dp.conv(x, np.ones((3, 3), np.float32)) - np.ones((4, 4, 3), np.float32)
    txt = dp.linop.to_text(op)
    assert "Variable(x)" in txt and "conv" in txt and "scale" in txt
    dot = dp.linop.to_dot(op)
    assert dot.startswith("digraph") and "Constant" in dot


def test_problem_visualize():
    x = dp.Variable()
    prob = dp.Problem(dp.sum_squares(x) + dp.nonneg(x))
    out = prob.visualize()
    assert "Variable" in out


def test_io_helpers(tmp_path):
    from dprox_tpu.utils.io import filter_ckpt, is_image_file, list_image_files

    ckpt = {"model.a": 1, "model.b": 2, "opt.c": 3}
    assert filter_ckpt("model.", ckpt) == {"a": 1, "b": 2}
    assert is_image_file("x.PNG") and not is_image_file("x.txt")
    (tmp_path / "a.png").write_bytes(b"")
    (tmp_path / "b.txt").write_bytes(b"")
    assert list_image_files(str(tmp_path)) == ["a.png"]


def test_hub_offline_behavior(tmp_path, monkeypatch):
    from dprox_tpu.utils import hub

    monkeypatch.setattr(hub, "CACHE_DIRS", [str(tmp_path)])
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "w.pth").write_bytes(b"x")
    assert hub.load_path("w.pth").endswith("w.pth")
    assert hub.load_path("missing.pth", raise_on_miss=False) is None
    try:
        hub.load_path("missing.pth")
        assert False
    except FileNotFoundError as e:
        assert "DPROX_ALLOW_DOWNLOAD" in str(e)


def test_hub_download_path(tmp_path, monkeypatch):
    """With downloads enabled, a cache miss resolves via the HF URL
    layout (reference huggingface.py:50-66) — urlretrieve mocked since
    this environment has no egress."""
    from dprox_tpu.utils import hub

    monkeypatch.setattr(hub, "CACHE_DIRS", [str(tmp_path / "cache")])
    fetched = {}

    def fake_urlretrieve(url, filename=None):
        fetched["url"] = url
        with open(filename, "wb") as f:
            f.write(b"weights")

    monkeypatch.setattr(hub.urllib.request, "urlretrieve", fake_urlretrieve)
    monkeypatch.setattr(hub.os.path, "expanduser",
                        lambda p: p.replace("~", str(tmp_path)))

    # downloads default OFF: miss raises even though the URL would work
    monkeypatch.setattr(hub, "_DOWNLOAD_ENABLED", False)
    assert hub.load_path("repo/w.pth", raise_on_miss=False) is None

    hub.set_download_enabled(True)
    try:
        p = hub.load_path("repo/w.pth")
        assert open(p, "rb").read() == b"weights"
        assert fetched["url"] == (
            "https://huggingface.co/delta-prox/repo/resolve/main/w.pth")
        # datasets carry the /datasets prefix
        hub.load_path("dset/d.mat", repo_type="datasets")
        assert fetched["url"] == (
            "https://huggingface.co/datasets/delta-prox/dset/resolve/main/d.mat")
    finally:
        hub.set_download_enabled(False)


def test_hub_interrupted_download_leaves_no_partial_cache(tmp_path, monkeypatch):
    """A transfer that dies mid-flight must not leave a file where
    _search would later resolve it as a valid cached asset."""
    from dprox_tpu.utils import hub

    monkeypatch.setattr(hub, "CACHE_DIRS", [str(tmp_path / "cache")])
    monkeypatch.setattr(hub.os.path, "expanduser",
                        lambda p: p.replace("~", str(tmp_path)))

    def dying_urlretrieve(url, filename=None):
        with open(filename, "wb") as f:
            f.write(b"half a weig")  # partial bytes hit disk...
        raise ConnectionError("reset mid-transfer")  # ...then the wire drops

    monkeypatch.setattr(hub.urllib.request, "urlretrieve", dying_urlretrieve)
    monkeypatch.setattr(hub, "_DOWNLOAD_ENABLED", True)
    with pytest.warns(UserWarning, match="download .* failed"):
        assert hub.load_path("repo/w.pth", raise_on_miss=False) is None
    cache_root = tmp_path / ".cache" / "dprox"
    leftovers = list(cache_root.rglob("*")) if cache_root.exists() else []
    assert not [p for p in leftovers if p.is_file()], leftovers
    # and a later successful fetch still lands atomically at the real path
    def good_urlretrieve(url, filename=None):
        with open(filename, "wb") as f:
            f.write(b"weights")

    monkeypatch.setattr(hub.urllib.request, "urlretrieve", good_urlretrieve)
    p = hub.load_path("repo/w.pth", raise_on_miss=False)
    assert p is not None and open(p, "rb").read() == b"weights"
    assert not p.endswith(".tmp")


def test_demosaic_bilinear_recovers_smooth():
    # on a smooth image, bilinear demosaic should be close to the original
    img = imaging.sample("face")[:, :, :64, :64]
    img = jnp.asarray(
        jax.image.resize(jax.image.resize(img, (1, 3, 8, 8), "linear"),
                         (1, 3, 64, 64), "linear"))
    m = imaging.mosaicing(img)
    rec = dp.utils.demosaic_from_mosaiced(m)
    assert metrics.psnr(rec, img) > 30


def test_demosaic_ea_recovers_smooth():
    # the cv2 edge-aware init (and its Malvar fallback) on a smooth image
    img = imaging.sample("face")[:, :, :64, :64]
    img = jnp.asarray(
        jax.image.resize(jax.image.resize(img, (1, 3, 8, 8), "linear"),
                         (1, 3, 64, 64), "linear"))
    m = imaging.mosaicing(img)
    rec = dp.utils.demosaic_ea(m)
    assert rec.shape == img.shape
    assert metrics.psnr(rec, img) > 30


def test_equilibrate_runs():
    x = dp.Variable()
    op = dp.conv(x, imaging.fspecial_gaussian(5, 2))
    d, e = dp.algo.stochastic_equilibrate(op, (1, 1, 16, 16), iters=3, samples=2)
    assert np.isfinite(np.asarray(d)).all() and np.isfinite(np.asarray(e)).all()


def test_metrics_suite():
    rng = np.random.RandomState(0)
    a = rng.rand(16, 16, 4).astype(np.float32)
    b = np.clip(a + 0.01 * rng.randn(16, 16, 4), 0, 1).astype(np.float32)
    assert metrics.psnr(a, a) == float("inf")
    assert 30 < metrics.psnr(a, b) < 60
    assert 0.5 < metrics.ssim(a, b) <= 1.0
    assert metrics.sam(a, b) < 10
    assert metrics.ergas(a, b) >= 0
    assert metrics.mpsnr(a, b) > 30
    assert 0.5 < metrics.mssim(a, b) <= 1.0
    assert metrics.mpsnr_max(a, b) > 20


def test_est_norm_power_iteration():
    x = dp.Variable()
    op = dp.scale(3.0, x)
    n = dp.linop.est_norm(op, shape=(1, 1, 8, 8), iters=20)
    assert abs(n - 3.0) < 0.1


def test_profiling_timer():
    from dprox_tpu.utils.profiling import IterationTimer, Timer

    t = Timer()
    _ = jnp.ones((8, 8)) * 2
    dt = t.lap(_)
    assert dt >= 0

    x = dp.Variable()
    solver = dp.compile(dp.sum_squares(x, b=dp.utils.array(np.ones((1, 1, 8, 8), np.float32)))
                        + dp.nonneg(x), method="admm")
    it = IterationTimer()
    solver.solve(x0=np.zeros((1, 1, 8, 8), np.float32), max_iter=3, callback=it)
    assert len(it.times) == 2


def test_checkpoint_roundtrip(tmp_path):
    from dprox_tpu.utils.checkpoint import load_pytree, save_pytree

    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    path = str(tmp_path / "ckpt.msgpack")
    kind = save_pytree(path, tree, use_orbax=False)
    assert kind == "msgpack"
    out = load_pytree(path, tree)
    assert np.allclose(np.asarray(out["b"]["c"]), 1.0)
