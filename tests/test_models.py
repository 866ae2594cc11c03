"""Denoiser zoo: shape/compile checks with deterministic random weights.

The reference's model tests require pretrained CUDA weights from
HuggingFace; this environment is offline, so these tests pin shapes,
dtype flow, and jit-compatibility (weight-conversion fidelity is covered
by test_convert when a checkpoint is present locally).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dprox_tpu.models import (DGUDenoiser, DnCNN, FFDNet, GRUnet, IRCNN, UNet,
                              UNetRes, tv_denoising)


KEY = jax.random.key(0)


def test_ffdnet_shapes():
    m = FFDNet(in_nc=1, out_nc=1, nc=64, nb=15)
    x = jnp.zeros((2, 33, 31, 1))  # odd sizes exercise replication pad
    p = m.init(KEY, x, jnp.zeros(()))
    y = m.apply(p, x, jnp.asarray([0.1, 0.2]))
    assert y.shape == x.shape


def test_ffdnet_color_shapes():
    m = FFDNet(in_nc=3, out_nc=3, nc=96, nb=12)
    x = jnp.zeros((1, 32, 32, 3))
    p = m.init(KEY, x, jnp.zeros(()))
    assert m.apply(p, x, 0.1).shape == x.shape


def test_ffdnet_fused_apply_matches_module():
    """The boundary-fused forward (6x6-stride-2 absorbed unshuffle +
    interior-pad depth-to-space, models/ffdnet.py::fused_apply) is the
    same function as module.apply — checked on CPU f32 over gray/color,
    residual on/off, odd sizes, batch, and scalar/per-sample sigma."""
    from dprox_tpu.models.ffdnet import fused_apply

    rng = np.random.RandomState(0)
    for in_nc, residual in [(1, False), (1, True), (3, True)]:
        m = FFDNet(in_nc=in_nc, out_nc=in_nc, nc=16, nb=5, residual=residual)
        p = m.init(KEY, jnp.zeros((1, 12, 12, in_nc)), jnp.zeros(()))
        for shape, sigma in [((1, 16, 16), 0.1),
                             ((2, 15, 17), jnp.asarray([0.05, 0.3]))]:
            x = jnp.asarray(rng.rand(*shape, in_nc).astype(np.float32))
            ref = m.apply(p, x, sigma)
            got = fused_apply(m, p, x, jnp.asarray(sigma))
            assert got.shape == ref.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5)


def test_ffdnet_fused_wrapper_toggle(monkeypatch):
    """DPROX_FFDNET_FUSED forces the fused/plain path through the
    denoiser wrappers; both agree (and the default CPU path is plain)."""
    from dprox_tpu.proxfn.pnp.denoisers import (FFDNetColorDenoiser,
                                                FFDNetDenoiser)

    rng = np.random.RandomState(1)
    for den in (FFDNetDenoiser(nc=8, nb=4), FFDNetColorDenoiser(nc=8, nb=4)):
        x = jnp.asarray(rng.rand(1, 3, 18, 18).astype(np.float32))
        monkeypatch.setenv("DPROX_FFDNET_FUSED", "0")
        ref = den.denoise(x, 0.1)
        monkeypatch.setenv("DPROX_FFDNET_FUSED", "1")
        got = den.denoise(x, 0.1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


def test_dncnn_ircnn():
    for m in (DnCNN(nb=5), IRCNN()):
        x = jnp.zeros((1, 16, 16, 1))
        p = m.init(KEY, x)
        assert m.apply(p, x).shape == x.shape


def test_drunet_shapes():
    m = UNetRes(in_nc=2, out_nc=1, nc=(8, 16, 32, 64), nb=2)
    x = jnp.zeros((1, 64, 64, 2))
    p = m.init(KEY, x)
    assert m.apply(p, x).shape == (1, 64, 64, 1)


def test_unet_shapes():
    m = UNet(in_channels=2, out_channels=1)
    x = jnp.zeros((1, 64, 64, 2))
    p = m.init(KEY, x)
    assert m.apply(p, x).shape == (1, 64, 64, 1)


def test_grunet_shapes():
    m = GRUnet(in_ch=2, out_ch=1, use_noise_map=True)
    x = jnp.zeros((1, 8, 32, 32, 2))
    p = m.init(KEY, x)
    assert m.apply(p, x).shape == (1, 8, 32, 32, 1)


def test_fpool_scan_matches_loop():
    from dprox_tpu.models.qrnn import fpool_scan

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.rand(1, 6, 4, 4, 2).astype(np.float32))
    f = jax.nn.sigmoid(jnp.asarray(rng.randn(1, 6, 4, 4, 2).astype(np.float32)))
    out = fpool_scan(z, f)
    # sequential reference
    h = None
    hs = []
    for t in range(6):
        zt, ft = z[:, t], f[:, t]
        h = (1 - ft) * zt if h is None else ft * h + (1 - ft) * zt
        hs.append(h)
    ref = jnp.stack(hs, axis=1)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # reverse direction
    out_r = fpool_scan(z, f, reverse=True)
    h = None
    hs = []
    for t in reversed(range(6)):
        zt, ft = z[:, t], f[:, t]
        h = (1 - ft) * zt if h is None else ft * h + (1 - ft) * zt
        hs.insert(0, h)
    ref_r = jnp.stack(hs, axis=1)
    assert np.allclose(np.asarray(out_r), np.asarray(ref_r), atol=1e-5)


def test_dgu_stages():
    m = DGUDenoiser(n_feat=8, scale_unetfeats=4, scale_orsnetfeats=4)
    v = jnp.zeros((1, 32, 32, 3))
    p = m.init(KEY, v)
    x, carry = m.apply(p, v, method="first")
    assert x.shape == v.shape
    x, carry = m.apply(p, x, carry, method="middle")
    assert x.shape == v.shape
    out = m.apply(p, x, carry, method="last")
    assert out.shape == v.shape


def test_tv_denoising_runs():
    y = jnp.asarray(np.random.RandomState(0).rand(16, 16, 3).astype(np.float32))
    out = tv_denoising(y, 0.1, 10)
    assert out.shape == y.shape
    assert np.isfinite(np.asarray(out)).all()


def test_pixel_shuffle_roundtrip_torch_order():
    import torch

    from dprox_tpu.models.blocks import pixel_shuffle, pixel_unshuffle

    rng = np.random.RandomState(0)
    x = rng.rand(2, 8, 8, 4).astype(np.float32)  # NHWC
    ours = pixel_unshuffle(jnp.asarray(x), 2)
    theirs = torch.pixel_unshuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2)
    assert np.allclose(np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1))
    back = pixel_shuffle(ours, 2)
    assert np.allclose(np.asarray(back), x)


def test_qrnnredc3d_config_axes():
    """QRNNREDC3D supports the reference's config axes (qrnn3d.py:5-47):
    sample_idx / has_ad / plain / is_2d / act."""
    from dprox_tpu.models.qrnn import QRNNREDC3D

    x = jnp.ones((1, 8, 16, 16, 1))
    outs = []
    for kw in (dict(), dict(has_ad=False), dict(plain=True),
               dict(is_2d=True), dict(act="relu"),
               dict(sample_idx=(0, 2), num_half_layer=4)):
        m = QRNNREDC3D(**kw)
        p = m.init(jax.random.key(0), x)
        y = m.apply(p, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
        outs.append(float(jnp.mean(y)))
    # the config axes genuinely change the computation
    assert len({round(v, 5) for v in outs}) == len(outs)

    # is_2d uses per-band (1,3,3) kernels EVERYWHERE, including the
    # upsampling decoder layers (reference: qrnn3d.py QRNNUpsampleConv3d
    # k=(1,3,3) when is_2d)
    m = QRNNREDC3D(is_2d=True)
    p = m.init(jax.random.key(0), x)
    kshapes = [np.asarray(v).shape
               for k, v in jax.tree_util.tree_leaves_with_path(p)
               if "kernel" in str(k)]
    assert all(s[0] == 1 for s in kshapes), kshapes


def test_optics_unet_shapes_and_padding():
    """Deep-optics baseline U_Net (reference: contrib/optic/unet.py:44-110):
    output matches input spatial shape even when H/W are not multiples
    of 32 (circular pad-to-32 + crop)."""
    from dprox_tpu.models import OpticsUNet
    from dprox_tpu.models.optics_unet import (pad_to_ratio_of_32,
                                              unpad_from_ratio_of_32)

    x = jnp.ones((1, 40, 50, 3))
    padded = pad_to_ratio_of_32(x)
    assert padded.shape == (1, 64, 64, 3)
    assert np.allclose(np.asarray(unpad_from_ratio_of_32(padded, x.shape)),
                       np.asarray(x))

    m = OpticsUNet(base_features=4)
    rng = np.random.RandomState(0)
    inp = jnp.asarray(rng.rand(1, 40, 50, 3), jnp.float32)
    p = m.init(jax.random.key(0), inp)
    y = m.apply(p, inp)
    assert y.shape == inp.shape
    assert np.isfinite(np.asarray(y)).all()
