"""Data layer tests: MNIST parsing/synthetic, stratified subset, CelebA
semantics, loader behavior, mean sampler."""

import gzip
import os
import struct

import numpy as np
import pytest

from csl_gan_tpu.data import celeba as celeba_mod
from csl_gan_tpu.data import mnist as mnist_mod
from csl_gan_tpu.data.loader import ArrayDataset, Loader
from csl_gan_tpu.privacy.mean_sampler import MeanSampler


def write_idx_images(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000803))
        f.write(struct.pack(">III", *arr.shape))
        f.write(arr.astype(np.uint8).tobytes())


def write_idx_labels(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000801))
        f.write(struct.pack(">I", arr.shape[0]))
        f.write(arr.astype(np.uint8).tobytes())


def test_idx_parser_roundtrip(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    imgs = np.random.default_rng(0).integers(0, 256, (50, 28, 28))
    labels = np.arange(50) % 10
    write_idx_images(str(raw / "train-images-idx3-ubyte"), imgs)
    write_idx_labels(str(raw / "train-labels-idx1-ubyte"), labels)
    x, y = mnist_mod.load_mnist(str(tmp_path))
    assert x.shape == (50, 28, 28, 1)
    np.testing.assert_allclose(x[..., 0] * 255.0, imgs, atol=0.5)
    np.testing.assert_array_equal(y, labels)


def test_idx_parser_gz(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    imgs = np.zeros((10, 28, 28), np.uint8)
    labels = np.arange(10)
    import io
    buf = io.BytesIO()
    buf.write(struct.pack(">I", 0x00000803))
    buf.write(struct.pack(">III", *imgs.shape))
    buf.write(imgs.tobytes())
    with gzip.open(str(raw / "train-images-idx3-ubyte.gz"), "wb") as f:
        f.write(buf.getvalue())
    buf2 = io.BytesIO()
    buf2.write(struct.pack(">I", 0x00000801))
    buf2.write(struct.pack(">I", 10))
    buf2.write(labels.astype(np.uint8).tobytes())
    with gzip.open(str(raw / "train-labels-idx1-ubyte.gz"), "wb") as f:
        f.write(buf2.getvalue())
    x, y = mnist_mod.load_mnist(str(tmp_path))
    assert x.shape == (10, 28, 28, 1)


def test_synthetic_fallback_deterministic():
    x1, y1 = mnist_mod.synthetic_mnist(100, seed=0)
    x2, y2 = mnist_mod.synthetic_mnist(100, seed=0)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    assert x1.min() >= 0 and x1.max() <= 1
    # balanced classes
    counts = np.bincount(y1, minlength=10)
    assert counts.min() == 10


def test_stratified_subset():
    x, y = mnist_mod.synthetic_mnist(1000, seed=1)
    xs, ys = mnist_mod.stratified_subset(x, y, 100)
    assert len(xs) == 100
    np.testing.assert_array_equal(np.bincount(ys), [10] * 10)


def test_loader_shuffles_and_drops_partial():
    ds = ArrayDataset(np.arange(103, dtype=np.float32)[:, None],
                      np.arange(103))
    loader = Loader(ds, batch_size=10, seed=3)
    assert len(loader) == 10
    batches = list(loader)
    assert len(batches) == 10
    all_items = np.concatenate([b[0][:, 0] for b in batches])
    assert len(np.unique(all_items)) == 100  # no repeats within epoch
    # different epoch order
    batches2 = list(loader)
    assert not np.array_equal(batches[0][0], batches2[0][0])


def test_celeba_synthetic_and_labels(tmp_path):
    ds = celeba_mod.CelebADataset("/nonexistent", im_size=32, length=40,
                                  attr_file=None, attr="Male")
    x, y = ds[0]
    assert x.shape == (32, 32, 3)
    assert x.min() >= -1 and x.max() <= 1
    assert ds.label_true_count == int((ds.labels == 1).sum())
    xi, yi = ds.get_item_with_label(1)
    assert yi == 1


def test_celeba_attr_parsing(tmp_path):
    attr_file = tmp_path / "list_attr_celeba.txt"
    header = " ".join(celeba_mod.CELEBA_ATTR[1:])
    lines = ["5", header]
    rng = np.random.default_rng(0)
    vals = rng.choice([-1, 1], size=(5, 40))
    for i in range(5):
        lines.append(f"{i + 1:06d}.jpg " + " ".join(str(v) for v in vals[i]))
    attr_file.write_text("\n".join(lines) + "\n")
    male_col = celeba_mod.CELEBA_ATTR.index("Male") - 1
    labels = celeba_mod.parse_attr_file(str(attr_file), "Male", 5, 0)
    np.testing.assert_array_equal(labels, (vals[:, male_col] == 1).astype(int))
    labels_off = celeba_mod.parse_attr_file(str(attr_file), "Male", 3, 2)
    np.testing.assert_array_equal(labels_off, (vals[2:, male_col] == 1).astype(int))


def test_mean_sampler(tmp_path):
    x, y = mnist_mod.synthetic_mnist(400, seed=2)
    ds = ArrayDataset(x, y)
    loader = Loader(ds, batch_size=200, seed=0)
    ms = MeanSampler(dataloader=loader, dataset_size=400, noise_std=0.1,
                     num_samples=3, mean_size=20, res=28, ch=1,
                     save_path=str(tmp_path / "ms"), n_classes=10,
                     smallest_class_size=40, seed=0)
    assert ms.mean_samples.shape == (10, 3, 28, 28, 1)
    assert len(os.listdir(tmp_path / "ms")) == 30
    imgs, labels = ms.sample(17)
    assert imgs.shape == (17, 28, 28, 1) and labels.shape == (17,)
    imgs2, labels2 = ms.sample(6, requested_labels=np.array([0, 1, 2, 3, 4, 5]))
    np.testing.assert_array_equal(labels2, [0, 1, 2, 3, 4, 5])
    eps, alpha = ms.get_privacy_cost(1e-5)
    assert np.isfinite(eps) and eps > 0
    # res/ch fix: MNIST sensitivity (28x28x1) < the reference's fixed 64x64x3,
    # so our (correct) epsilon is smaller than the reference's conservative one.
    ms64 = MeanSampler.__new__(MeanSampler)
    ms64.__dict__.update(ms.__dict__)
    ms64.res, ms64.ch = 64, 3
    eps64, _ = ms64.get_privacy_cost(1e-5)
    assert eps < eps64


def test_mean_sampler_unconditional():
    x, y = mnist_mod.synthetic_mnist(100, seed=3)
    loader = Loader(ArrayDataset(x, y), batch_size=50, seed=0)
    ms = MeanSampler(dataloader=loader, dataset_size=100, noise_std=0.2,
                     num_samples=2, mean_size=50, res=28, ch=1, n_classes=1,
                     seed=0)
    imgs, labels = ms.sample(5)
    assert labels is None and imgs.shape == (5, 28, 28, 1)


def test_celeba_decoded_cache(tmp_path):
    ds = celeba_mod.CelebADataset("/nonexistent", im_size=16, length=12,
                                  attr_file=None, attr="Male")
    u8, labels = ds.decoded_cache(cache_dir=str(tmp_path / "cache"))
    assert u8.shape == (12, 16, 16, 3) and u8.dtype == np.uint8
    assert labels.shape == (12,)
    # cache reuse: second call maps the same file
    u8b, _ = ds.decoded_cache(cache_dir=str(tmp_path / "cache"))
    np.testing.assert_array_equal(np.asarray(u8), np.asarray(u8b))


def test_array_dataset_transform():
    imgs = (np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3))
    ds = ArrayDataset(imgs, np.zeros(2, np.int64),
                      transform=lambda b: b.astype(np.float32) / 127.5 - 1.0)
    x, y = ds[0]
    assert x.dtype == np.float32 and x.min() >= -1 and x.max() <= 1
    loader = Loader(ds, batch_size=2, shuffle=False)
    xb, yb = loader.one_batch()
    assert xb.dtype == np.float32 and xb.shape == (2, 4, 4, 3)


def test_download_mnist_offline_fails_clearly(tmp_path, monkeypatch):
    """--download_mnist with no network must raise a clear error, NOT fall
    back to synthetic data (the user explicitly asked for the real set);
    reference init_util.py:16-18 downloads via torchvision."""
    import urllib.request
    import pytest

    def no_net(url, dst=None, *a, **k):
        raise OSError("network unreachable (test)")

    monkeypatch.setattr(urllib.request, "urlretrieve", no_net)
    with pytest.raises(RuntimeError, match="download_mnist"):
        mnist_mod.load_mnist(str(tmp_path), train=True, download=True)


def test_download_mnist_fetches_idx_files(tmp_path, monkeypatch):
    """With a (mocked) reachable mirror the IDX files land in the
    torchvision layout and parse."""
    import gzip
    import struct
    import urllib.request

    def fake_fetch(url, dst):
        name = url.rsplit("/", 1)[1]
        n = 4
        if "images" in name:
            payload = struct.pack(">IIII", 0x00000803, n, 28, 28) + \
                bytes(n * 28 * 28)
        else:
            payload = struct.pack(">II", 0x00000801, n) + bytes(range(n))
        with gzip.open(dst, "wb") as f:
            f.write(payload)

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_fetch)
    imgs, labels = mnist_mod.load_mnist(str(tmp_path), train=True,
                                        download=True)
    assert imgs.shape == (4, 28, 28, 1)
    assert list(labels) == [0, 1, 2, 3]
    # Files persisted in torchvision's layout; a second load needs no net.
    monkeypatch.setattr(urllib.request, "urlretrieve",
                        lambda *a, **k: (_ for _ in ()).throw(OSError("no")))
    imgs2, _ = mnist_mod.load_mnist(str(tmp_path), train=True)
    assert imgs2.shape == (4, 28, 28, 1)
