"""Privatized per-class mean samples as public surrogate data.

Functional re-design of reference mean_sampler.py:12-92: build `num_samples`
noisy per-class mean images from a dataloader, persist them as PNGs, resample
with fresh small noise at training time, and report the RDP privacy cost of
their release.

Accounting fix vs the reference (do-not-copy list, SURVEY.md §7): the
reference always uses res=64, ch=3 in the sensitivity calculation even for
MNIST (mean_sampler.py:14,87-88 with train.py:59-69 never passing res/ch),
overstating epsilon for MNIST. Here the true image shape is used.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from csl_gan_tpu.privacy import rdp as rdp_mod
from csl_gan_tpu.utils.images import denorm_celeba, save_image


class MeanSampler:
    """mean_size and num_samples are per-class (reference mean_sampler.py:16)."""

    def __init__(self, dataloader=None, path: Optional[str] = None,
                 noise_std: float = 0.1, num_samples: int = 32,
                 mean_size: int = 100, dataset_size: int = 180000,
                 res: int = 64, ch: int = 3, save_path: Optional[str] = None,
                 default_batch_size: Optional[int] = None, n_classes: int = 1,
                 smallest_class_size: Optional[float] = None, seed: int = 0):
        self.noise_std = noise_std
        self.num_samples = num_samples
        self.mean_size = mean_size
        self.dataset_size = dataset_size
        self.res = res
        self.ch = ch
        self.default_batch_size = default_batch_size
        self.n_classes = n_classes
        self.smallest_class_size = smallest_class_size
        self.sample_rate = (mean_size / dataset_size if smallest_class_size is None
                            else mean_size / smallest_class_size)
        self._rng = np.random.default_rng(seed)

        if path is not None:
            self.load_mean_samples(path)
        elif dataloader is not None:
            self.make_mean_samples(dataloader, save_path=save_path)

    def make_mean_samples(self, dataloader, save_path: Optional[str] = None) -> None:
        """One noisy class-mean per (class, sample-index): shape
        [n_classes, num_samples, H, W, C] (reference mean_sampler.py:48-73)."""
        per_class = [[] for _ in range(self.n_classes)]
        for _ in range(self.num_samples):
            samples, labels = dataloader.one_batch()
            for c in range(self.n_classes):
                if self.n_classes > 1:
                    s = samples[labels == c]
                    s = s[: self.mean_size].sum(axis=0) / self.mean_size
                else:
                    s = samples.sum(axis=0) / self.mean_size
                noise = self._rng.normal(0, self.noise_std, size=s.shape)
                per_class[c].append((s + noise).astype(np.float32))
        self.mean_samples = np.stack([np.stack(s) for s in per_class])
        self.res = self.mean_samples.shape[-3]
        self.ch = self.mean_samples.shape[-1]

        if save_path is not None:
            os.makedirs(save_path, exist_ok=True)
            for c in range(self.mean_samples.shape[0]):
                for i in range(self.mean_samples.shape[1]):
                    save_image(denorm_celeba(self.mean_samples[c, i]),
                               os.path.join(save_path, f"{c}-{i + 1}.png"))

    def load_mean_samples(self, path: str) -> None:
        """Reload previously saved mean samples (PNG dir).

        Note: PNG round-trip quantizes to 8 bits and the denorm applied at
        save time is inverted here; intended for resuming runs.
        """
        from PIL import Image
        files = sorted(f for f in os.listdir(path) if f.endswith(".png"))
        per_class: dict = {}
        for f in files:
            c, i = f[:-4].split("-")
            arr = np.asarray(Image.open(f"{path}/{f}"), dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
            per_class.setdefault(int(c), []).append(arr * 2.0 - 1.0)
        self.mean_samples = np.stack(
            [np.stack(per_class[c]) for c in sorted(per_class)])
        self.res = self.mean_samples.shape[-3]
        self.ch = self.mean_samples.shape[-1]

    def sample(self, size: int, noise_std: float = 0.01,
               noise_mean_std: float = 0.01,
               requested_labels: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Resample `size` surrogates with fresh per-image scalar + pixel noise
        (reference mean_sampler.py:75-84)."""
        reps = (size - 1) // self.num_samples + 1
        perms = np.concatenate(
            [self._rng.permutation(self.num_samples) for _ in range(reps)])[:size]
        if requested_labels is None:
            labels = self._rng.integers(0, self.n_classes, size=size)
        else:
            labels = np.asarray(requested_labels)
        r = self.mean_samples[labels, perms].copy()
        if noise_mean_std and noise_mean_std > 0:
            r += self._rng.normal(0, noise_mean_std, size=(size, 1, 1, 1)).astype(np.float32)
        if noise_std and noise_std > 0:
            r += self._rng.normal(0, noise_std, size=r.shape).astype(np.float32)
        return r.astype(np.float32), (labels if self.n_classes > 1 else None)

    def device_sample_fn(self):
        """A jit-safe sampler over device-resident mean samples.

        Returns f(samples, key, labels_or_None, size) -> (imgs, labels);
        index selection is with replacement (the host path permutes in
        blocks — distributionally equivalent surrogate sampling)."""
        n_cls = self.n_classes
        n_samp = self.num_samples

        def f(samples, key, labels, size):
            import jax
            import jax.numpy as jnp
            k1, k2, k3, k4 = jax.random.split(key, 4)
            if labels is None:
                labels = jax.random.randint(k1, (size,), 0, n_cls)
            idx = jax.random.randint(k2, (size,), 0, n_samp)
            r = samples[labels, idx]
            r = r + 0.01 * jax.random.normal(k3, (size,) + (1,) * (r.ndim - 1))
            r = r + 0.01 * jax.random.normal(k4, r.shape)
            return r, labels

        return f

    def get_privacy_cost(self, target_delta: float = 1e-6,
                         alphas=None) -> Tuple[float, float]:
        """RDP cost of releasing all mean samples (mean_sampler.py:86-92):
        each is a mean of `mean_size` samples with per-pixel sensitivity
        1/(2*mean_size) and Gaussian noise noise_std."""
        alphas = rdp_mod.DEFAULT_ALPHAS if alphas is None else alphas
        pixel_sensitivity = 1 / self.mean_size / 2
        l2_sensitivity = float(np.sqrt(self.ch * self.res ** 2 * pixel_sensitivity ** 2))
        r = rdp_mod.compute_rdp(self.sample_rate, self.noise_std / l2_sensitivity,
                                self.num_samples * self.n_classes, orders=alphas)
        return rdp_mod.get_privacy_spent(orders=alphas, rdp=r, delta=target_delta)
