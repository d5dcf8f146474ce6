"""Frechet Inception Distance machinery.

Reimplements the pytorch_fid protocol the reference uses
(mem_inf_attack.py:416: batch 50, 2048-dim InceptionV3 pool features over
2048 generated samples) with a pluggable feature extractor:

  - "inception": InceptionV3 pool3 features, loaded from a pretrained
    weights file (npz) pointed to by $FID_INCEPTION_WEIGHTS. This matches
    pytorch_fid numerically when the standard FID weights are supplied. In
    offline environments without the weights file this extractor is
    unavailable.
  - "pixel" (fallback): features = flattened 16x16 bilinear-downsampled
    grayscale pixels. The Frechet statistics pipeline is identical; numbers
    are NOT comparable to Inception-FID and are labeled `pixel_fid`.

The Frechet distance computation (matrix sqrt via scipy) follows the
standard Heusel et al. 2017 formulation.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Tuple

import numpy as np
from scipy import linalg


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def activation_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


# ---------------- feature extractors ----------------

def pixel_features(images: np.ndarray, res: int = 16) -> np.ndarray:
    """Fallback features: grayscale images area-downsampled to res x res.

    images: NHWC float in [0, 1].
    """
    x = np.asarray(images, dtype=np.float32)
    if x.shape[-1] == 3:
        x = x @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    else:
        x = x[..., 0]
    n, h, w = x.shape
    fh, fw = h // res, w // res
    if fh >= 1 and fw >= 1:
        x = x[:, : fh * res, : fw * res]
        x = x.reshape(n, res, fh, res, fw).mean(axis=(2, 4))
    return x.reshape(n, -1)


def inception_weights_path() -> Optional[str]:
    p = os.environ.get("FID_INCEPTION_WEIGHTS")
    return p if p and os.path.exists(p) else None


def make_feature_fn(kind: str = "auto") -> Tuple[Callable, str]:
    """Returns (feature_fn(images)->[N,D], label)."""
    if kind in ("auto", "inception"):
        wpath = inception_weights_path()
        if wpath is not None:
            from csl_gan_tpu.tools.inception import make_inception_features
            return make_inception_features(wpath), "fid"
        if kind == "inception":
            raise FileNotFoundError(
                "Inception FID weights not found; set FID_INCEPTION_WEIGHTS")
    return pixel_features, "pixel_fid"


def features_from_images(images: np.ndarray, feature_fn: Callable,
                         batch_size: int = 50) -> np.ndarray:
    out = []
    for i in range(0, len(images), batch_size):
        out.append(np.asarray(feature_fn(images[i:i + batch_size])))
    return np.concatenate(out)


def load_images_from_dir(path: str, limit: Optional[int] = None) -> np.ndarray:
    from PIL import Image
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if limit:
        files = files[:limit]
    imgs = []
    for f in files:
        arr = np.asarray(Image.open(os.path.join(path, f)), dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        imgs.append(arr)
    return np.stack(imgs)


def calculate_fid(images1: np.ndarray, images2: np.ndarray,
                  batch_size: int = 50, kind: str = "auto") -> Tuple[float, str]:
    """(distance, label). label is "fid" (Inception) or "pixel_fid"."""
    feature_fn, label = make_feature_fn(kind)
    f1 = features_from_images(images1, feature_fn, batch_size)
    f2 = features_from_images(images2, feature_fn, batch_size)
    mu1, s1 = activation_statistics(f1)
    mu2, s2 = activation_statistics(f2)
    return frechet_distance(mu1, s1, mu2, s2), label


def calculate_fid_given_paths(paths, batch_size: int = 50,
                              kind: str = "auto") -> Tuple[float, str]:
    """The pytorch_fid entry-point shape (mem_inf_attack.py:416)."""
    imgs1 = load_images_from_dir(paths[0])
    imgs2 = load_images_from_dir(paths[1])
    return calculate_fid(imgs1, imgs2, batch_size, kind)
