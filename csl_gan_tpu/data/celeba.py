"""CelebA dataset: file-number-indexed JPEGs with attribute labels.

Re-design of reference datasets.py:20-63 without torch/torchvision:
  - images addressed as `str(offset+i+1).zfill(6).jpg` under root
  - binary attribute labels parsed from `list_attr_celeba.txt`
  - per-image transform: resize shorter side to im_size, center crop,
    random horizontal flip, normalize to [-1, 1]; output NHWC float32
  - `get_item_with_label` linear-probe label search (datasets.py:59-63)

When the root directory is missing (offline dev), a deterministic synthetic
stand-in is generated so smoke tests exercise the full CelebA code path.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

CELEBA_ATTR = ["Filename", "5_o_Clock_Shadow", "Arched_Eyebrows", "Attractive",
               "Bags_Under_Eyes", "Bald", "Bangs", "Big_Lips", "Big_Nose",
               "Black_Hair", "Blond_Hair", "Blurry", "Brown_Hair",
               "Bushy_Eyebrows", "Chubby", "Double_Chin", "Eyeglasses",
               "Goatee", "Gray_Hair", "Heavy_Makeup", "High_Cheekbones",
               "Male", "Mouth_Slightly_Open", "Mustache", "Narrow_Eyes",
               "No_Beard", "Oval_Face", "Pale_Skin", "Pointy_Nose",
               "Receding_Hairline", "Rosy_Cheeks", "Sideburns", "Smiling",
               "Straight_Hair", "Wavy_Hair", "Wearing_Earrings", "Wearing_Hat",
               "Wearing_Lipstick", "Wearing_Necklace", "Wearing_Necktie",
               "Young"]


def parse_attr_file(attr_file: str, attr: str, length: int, offset: int) -> np.ndarray:
    """Binary labels for `attr` over rows [offset, offset+length) of the
    standard annotation file (reference datasets.py:40)."""
    col = CELEBA_ATTR.index(attr)  # column 0 is the filename
    labels = np.zeros(length, dtype=np.int64)
    with open(attr_file) as f:
        next(f)  # count line
        next(f)  # header line
        for i, line in enumerate(f):
            if i < offset:
                continue
            if i >= offset + length:
                break
            parts = line.split()
            labels[i - offset] = 1 if int(parts[col]) == 1 else 0
    return labels


class CelebADataset:
    """Lazy-decoding CelebA with the reference's indexing/transform semantics."""

    def __init__(self, root: str, im_size: int = 64, length: Optional[int] = None,
                 offset: int = 0, ext: str = "jpg", attr_file: Optional[str] = None,
                 attr: Optional[str] = None, rng_seed: int = 0):
        self.root = root
        self.im_size = im_size
        self.offset = offset
        self.ext = ext
        self.synthetic = not (root and os.path.isdir(root))
        if self.synthetic:
            print(f"[csl_gan_tpu] CelebA not found under {root!r}; "
                  "using deterministic synthetic images.")
            self.length = length or 2000
        else:
            self.length = length or len(os.listdir(self.root))
        self._rng = np.random.default_rng(rng_seed)

        if attr is None or (attr_file and not os.path.exists(attr_file) and self.synthetic):
            attr = None if attr is None else attr
        if attr is None:
            self.labels = None
            self.label_true_count = None
        elif self.synthetic or attr_file is None or not os.path.exists(attr_file):
            syn_rng = np.random.default_rng(42 + offset)
            self.labels = (syn_rng.random(self.length) < 0.42).astype(np.int64)
            self.label_true_count = int((self.labels == 1).sum())
        else:
            self.labels = parse_attr_file(attr_file, attr, self.length, self.offset)
            self.label_true_count = int((self.labels == 1).sum())

        self.n_classes = 1

    def __len__(self):
        return self.length

    def _decode(self, number: int) -> np.ndarray:
        """Decode + resize + center crop -> HWC uint8-scale float in [0,1]."""
        if self.synthetic:
            rng = np.random.default_rng(self.offset + number)
            base = rng.random((self.im_size, self.im_size, 3)).astype(np.float32)
            return base
        fname = str(self.offset + number).zfill(6) + "." + self.ext
        img = Image.open(os.path.join(self.root, fname)).convert("RGB")
        w, h = img.size
        scale = self.im_size / min(w, h)
        img = img.resize((max(self.im_size, round(w * scale)),
                          max(self.im_size, round(h * scale))), Image.BILINEAR)
        w, h = img.size
        left, top = (w - self.im_size) // 2, (h - self.im_size) // 2
        img = img.crop((left, top, left + self.im_size, top + self.im_size))
        return np.asarray(img, dtype=np.float32) / 255.0

    def get_sample(self, number: int) -> Tuple[np.ndarray, int]:
        """1-based sample access with flip + [-1,1] normalize
        (reference datasets.py:48-54, including its labels[number-1] offset)."""
        x = self._decode(number)
        if self._rng.random() < 0.5:
            x = x[:, ::-1, :]
        x = x * 2.0 - 1.0
        label = 0 if self.labels is None else int(self.labels[number - 1])
        return np.ascontiguousarray(x), label

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        return self.get_sample(index + 1)

    def get_item_with_label(self, label: int, number: Optional[int] = None):
        number = int(self._rng.integers(0, self.length)) if number is None else number
        while self.labels[number] != label:
            number = (number + 1) % self.length
        return self[number]

    def materialize(self, indices=None) -> Tuple[np.ndarray, np.ndarray]:
        """Decode a set of samples into (images NHWC, labels)."""
        idx = range(self.length) if indices is None else indices
        xs, ys = [], []
        for i in idx:
            x, y = self[i]
            xs.append(x)
            ys.append(y)
        return np.stack(xs), np.asarray(ys, dtype=np.int64)

    def decoded_cache(self, cache_dir: Optional[str] = None,
                      n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """Decode-once uint8 cache of the whole dataset (no flip, no
        normalize — those run on-device per epoch).

        Returns (images uint8 NHWC, labels int64). The decoded array is
        memory-mapped from `<cache_dir>/celeba_<size>_<off>_<len>.npy` and
        reused across runs; 180k 64px images are ~2.2 GB — they fit in TPU
        HBM, enabling the device-resident scan path with on-device
        augmentation instead of per-batch host JPEG decode.
        """
        labels = (self.labels if self.labels is not None
                  else np.zeros(self.length, np.int64))
        if cache_dir is None:
            cache_dir = os.path.join(self.root if not self.synthetic else "/tmp",
                                     "_decoded_cache")
        os.makedirs(cache_dir, exist_ok=True)
        tag = f"celeba_{self.im_size}_{self.offset}_{self.length}"
        if self.synthetic:
            tag += "_syn"
        path = os.path.join(cache_dir, tag + ".npy")
        if os.path.exists(path):
            return np.load(path, mmap_mode="r"), labels
        print(f"[csl_gan_tpu] decoding {self.length} CelebA images into {path} ...")
        arr = np.empty((self.length, self.im_size, self.im_size, 3), np.uint8)
        done = np.zeros(self.length, bool)
        if not self.synthetic:
            # Native C++ pipeline (data/native): threaded libjpeg decode +
            # PIL-parity resample+crop — the reference gets this parallelism
            # from torch DataLoader worker processes; here it's a thread
            # pool with no IPC. Falls back to PIL per-image on any failure.
            from csl_gan_tpu.data import native
            if native.available():
                chunk = 4096
                for lo in range(0, self.length, chunk):
                    hi = min(lo + chunk, self.length)
                    paths = [os.path.join(
                        self.root,
                        str(self.offset + i + 1).zfill(6) + "." + self.ext)
                        for i in range(lo, hi)]
                    out, ok = native.decode_batch(paths, self.im_size,
                                                  n_threads=n_threads)
                    arr[lo:hi] = out
                    done[lo:hi] = ok
        for i in np.nonzero(~done)[0]:
            arr[i] = np.clip(self._decode(int(i) + 1) * 255.0 + 0.5, 0, 255)
        np.save(path, arr)
        return np.load(path, mmap_mode="r"), labels
