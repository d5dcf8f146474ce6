"""Native C++ image pipeline (csl_gan_tpu/data/native) parity tests.

The native path must reproduce the Python/PIL decode path of
data/celeba.py `_decode` (reference transform semantics,
datasets.py:44-54) within +-1 LSB: same libjpeg decode, PIL-BILINEAR-
compatible scaled-support triangle resample, same center crop.
"""

import os

import numpy as np
import pytest

from csl_gan_tpu.data import native
from csl_gan_tpu.data.celeba import CelebADataset

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++/libjpeg unavailable")


def _write_jpegs(root, n, size=(178, 218), seed=3):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        a = rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
        p = os.path.join(root, str(i + 1).zfill(6) + ".jpg")
        Image.fromarray(a).save(p, quality=95)
        paths.append(p)
    return paths


def test_resample_matches_pil_bilinear():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (218, 178, 3), dtype=np.uint8)
    img = Image.fromarray(base)
    for tw, th in [(64, 78), (52, 64), (178, 218), (300, 340), (37, 91)]:
        ref = np.asarray(img.resize((tw, th), Image.BILINEAR)).astype(int)
        got = native.resample(base, tw, th).astype(int)
        assert np.abs(ref - got).max() <= 1, (tw, th)


def test_decode_batch_matches_python_decode(tmp_path):
    root = str(tmp_path / "celeba")
    paths = _write_jpegs(root, 5)
    ds = CelebADataset(root, im_size=64, length=5)
    assert not ds.synthetic
    out, ok = native.decode_batch(paths, 64, n_threads=2)
    assert ok.all()
    for i in range(5):
        ref = np.clip(ds._decode(i + 1) * 255.0 + 0.5, 0, 255).astype(int)
        assert np.abs(ref - out[i].astype(int)).max() <= 1


def test_decode_batch_flags_failures(tmp_path):
    root = str(tmp_path / "c2")
    paths = _write_jpegs(root, 2)
    bad = str(tmp_path / "missing.jpg")
    trunc = str(tmp_path / "trunc.jpg")
    with open(paths[0], "rb") as f:
        blob = f.read()
    with open(trunc, "wb") as f:
        f.write(blob[:40])
    out, ok = native.decode_batch([paths[0], bad, paths[1], trunc], 64)
    assert list(ok) == [True, False, True, False]


def test_decoded_cache_uses_native_and_matches(tmp_path):
    root = str(tmp_path / "c3")
    _write_jpegs(root, 7, size=(90, 110))
    ds = CelebADataset(root, im_size=48, length=7)
    arr, labels = ds.decoded_cache(cache_dir=str(tmp_path / "cache"))
    assert arr.shape == (7, 48, 48, 3) and arr.dtype == np.uint8
    for i in range(7):
        ref = np.clip(ds._decode(i + 1) * 255.0 + 0.5, 0, 255).astype(int)
        assert np.abs(ref - arr[i].astype(int)).max() <= 1
