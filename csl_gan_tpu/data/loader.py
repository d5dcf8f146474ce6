"""Host-side data pipeline feeding the jitted train step.

Replaces torch DataLoader workers (reference init_util.py:39-40) with a
simple reshuffling batch iterator plus an optional background-thread
prefetcher that overlaps host batch assembly (and CelebA JPEG decode) with
device compute. Batches are handed to JAX as numpy arrays; the train loop
does a single `jax.device_put` with the batch sharding, so on a mesh the
batch lands already sharded over the data axis.

Static-shape note: partial trailing batches would retrace the compiled step,
so the loader drops the last partial batch (torch's default kept it; with
all shipped configs train_set_size divides batch_size so behavior matches).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np


class ArrayDataset:
    """In-memory (or memory-mapped) dataset of (images NHWC, labels int64).

    `transform`, when set, maps a raw image batch to the training
    representation on the host path (e.g. uint8 -> normalized float with
    random flip for cached CelebA); the device-resident path uploads the raw
    array and applies the equivalent transform on-device instead.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray, transform=None):
        self.images = images
        self.labels = labels
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        x = self.images[i]
        if self.transform is not None:
            x = self.transform(x[None])[0]
        return x, self.labels[i]

    def get_item_with_label(self, label, number=None, _rng=np.random):
        idx = np.nonzero(self.labels == label)[0]
        return self[int(idx[_rng.randint(len(idx))])]

    def materialize(self, indices=None):
        if indices is None:
            return self.images, self.labels
        return self.images[indices], self.labels[indices]


class Loader:
    """Reshuffling epoch iterator yielding fixed-size numpy batches."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def _make_batch(self, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(self.dataset, ArrayDataset):
            x = self.dataset.images[idx]
            if self.dataset.transform is not None:
                x = self.dataset.transform(x)
            return x, self.dataset.labels[idx]
        xs, ys = [], []
        for i in idx:
            x, y = self.dataset[int(i)]
            xs.append(x)
            ys.append(y)
        return np.stack(xs), np.asarray(ys, dtype=np.int64)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = self._epoch_indices()
        n_full = len(idx) // self.batch_size
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_full)]
        if not self.drop_last and len(idx) % self.batch_size:
            batches.append(idx[n_full * self.batch_size:])

        if self.prefetch <= 0 or isinstance(self.dataset, ArrayDataset):
            for b in batches:
                yield self._make_batch(b)
            return

        # Background-thread prefetch for datasets with real decode cost.
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for b in batches:
                    q.put(self._make_batch(b))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item

    def one_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        """A single shuffled batch (the reference's `next(iter(loader))`)."""
        idx = self._epoch_indices()[: self.batch_size]
        return self._make_batch(idx)

    def iter_indices(self) -> Iterator[np.ndarray]:
        """One epoch of shuffled batch-index arrays (for the device-resident
        data path: only these tiny index vectors cross host->device)."""
        idx = self._epoch_indices()
        n_full = len(idx) // self.batch_size
        for i in range(n_full):
            yield idx[i * self.batch_size:(i + 1) * self.batch_size]


def init_data(opt):
    """(dataset, dataloader, public_dataset, public_dataloader) — the
    reference init_util.init_data contract (init_util.py:13-42)."""
    from csl_gan_tpu.data import celeba as celeba_mod
    from csl_gan_tpu.data import mnist as mnist_mod

    dataset = public_dataset = None
    if opt.dataset == "MNIST":
        dl = bool(getattr(opt, "download_mnist", False))
        images, labels = mnist_mod.load_mnist(opt.data_path, train=True,
                                              download=dl)
        images, labels = mnist_mod.stratified_subset(images, labels, opt.train_set_size)
        dataset = ArrayDataset(images, labels)
        if opt.public_set_size > 0:
            pub_images, pub_labels = mnist_mod.load_mnist(opt.data_path,
                                                          train=False,
                                                          download=dl)
            public_dataset = ArrayDataset(pub_images, pub_labels)
    elif opt.dataset == "CelebA":
        dataset = celeba_mod.CelebADataset(
            opt.data_path, im_size=opt.im_size, length=opt.train_set_size,
            attr_file=getattr(opt, "label_path", None),
            attr=getattr(opt, "label_attr", None), rng_seed=opt.manual_seed)
        if opt.public_set_size > 0:
            public_dataset = celeba_mod.CelebADataset(
                opt.data_path, im_size=opt.im_size, length=opt.public_set_size,
                offset=opt.train_set_size,
                attr_file=getattr(opt, "label_path", None),
                attr=getattr(opt, "label_attr", None), rng_seed=opt.manual_seed + 1)

    dataloader = Loader(dataset, opt.batch_size, shuffle=True, seed=opt.manual_seed)
    public_dataloader = (Loader(public_dataset, opt.batch_size, shuffle=True,
                                seed=opt.manual_seed + 2)
                         if opt.public_set_size > 0 else None)
    return dataset, dataloader, public_dataset, public_dataloader
