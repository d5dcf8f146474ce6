"""Image saving utilities (replace torchvision.utils.save_image).

All arrays are NHWC float32. `save_image_grid` mirrors torchvision's
save_image grid semantics used by the reference for fixed-z sample sheets
(train.py:298-308): nrow images per row, 2px padding, values clamped to
[0, 1] before quantization.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def denorm_celeba(img):
    """[-1,1] -> [0,1] (reference util.py:13-14)."""
    return np.clip((np.asarray(img) + 1.0) / 2.0, 0.0, 1.0)


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0)
    return (img * 255.0 + 0.5).astype(np.uint8)


def save_image(img: np.ndarray, path: str) -> None:
    """Save one HWC (or HW1) image in [0,1]."""
    arr = _to_uint8(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def save_image_grid(imgs: np.ndarray, path: str, nrow: int = 8,
                    padding: int = 2) -> None:
    """Tile a batch (NHWC, [0,1]) into a grid PNG."""
    imgs = np.clip(np.asarray(imgs, dtype=np.float32), 0.0, 1.0)
    n, h, w, c = imgs.shape
    ncol = max(1, nrow)
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * (h + padding) + padding,
                     ncol * (w + padding) + padding, c), dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        top = r * (h + padding) + padding
        left = col * (w + padding) + padding
        grid[top:top + h, left:left + w] = imgs[i]
    save_image(grid, path)
