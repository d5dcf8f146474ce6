"""FID machinery + InceptionV3 port tests."""

import numpy as np
import pytest

from csl_gan_tpu.tools import fid as fid_mod


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 16))
    mu, sigma = fid_mod.activation_statistics(f)
    assert fid_mod.frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_analytic():
    # Independent gaussians: d^2 = |mu1-mu2|^2 + sum (sqrt(v1)-sqrt(v2))^2
    mu1, mu2 = np.zeros(3), np.array([1.0, 0.0, 0.0])
    s1 = np.diag([1.0, 1.0, 1.0])
    s2 = np.diag([4.0, 1.0, 1.0])
    want = 1.0 + (2.0 - 1.0) ** 2
    assert fid_mod.frechet_distance(mu1, s1, mu2, s2) == pytest.approx(want, rel=1e-6)


def test_pixel_features_shapes():
    imgs = np.random.default_rng(1).random((10, 28, 28, 1)).astype(np.float32)
    f = fid_mod.pixel_features(imgs)
    assert f.shape == (10, 256)
    rgb = np.random.default_rng(1).random((4, 64, 64, 3)).astype(np.float32)
    assert fid_mod.pixel_features(rgb).shape == (4, 256)


def test_calculate_fid_separates_distributions():
    rng = np.random.default_rng(2)
    a = rng.random((64, 28, 28, 1)).astype(np.float32)
    b = np.clip(a + 0.5, 0, 1)
    same, label = fid_mod.calculate_fid(a, a.copy(), kind="pixel")
    diff, _ = fid_mod.calculate_fid(a, b, kind="pixel")
    assert label == "pixel_fid"
    assert same == pytest.approx(0.0, abs=1e-4)
    assert diff > same + 0.1


def test_inception_port_structure():
    from csl_gan_tpu.tools import inception as inc
    shapes = inc.param_shapes()
    convs = [k for k in shapes if k.endswith(".conv.weight")]
    assert len(convs) == 94  # torchvision InceptionV3 conv-layer count
    # every conv has its 4 BN tensors
    for c in convs:
        stem = c[: -len(".conv.weight")]
        for suf in [".bn.weight", ".bn.bias", ".bn.running_mean", ".bn.running_var"]:
            assert stem + suf in shapes
    assert len(shapes) == 94 * 5


def test_inception_forward_random_weights():
    import jax.numpy as jnp
    from csl_gan_tpu.tools import inception as inc
    params = inc.random_params(0)
    feats = inc.inception_features(
        inc._Params(params),
        jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32))
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_fid_uses_inception_when_weights_present(tmp_path, monkeypatch):
    from csl_gan_tpu.tools import inception as inc
    wpath = tmp_path / "w.npz"
    np.savez(wpath, **inc.random_params(0))
    monkeypatch.setenv("FID_INCEPTION_WEIGHTS", str(wpath))
    fn, label = fid_mod.make_feature_fn("auto")
    assert label == "fid"
    imgs = np.random.default_rng(3).random((2, 28, 28, 1)).astype(np.float32)
    f = np.asarray(fn(imgs))
    assert f.shape == (2, 2048)
