"""ctypes loader for the native (C++) image pipeline — imageops.cpp.

Builds the shared library with g++ on first use (cached next to the
source; rebuilt when the source is newer) and exposes:

  decode_batch(paths, im_size, n_threads) -> (uint8 [n,s,s,3], ok bool[n])
  resample(rgb_hwc_uint8, out_w, out_h)   -> uint8 [out_h, out_w, 3]

Returns None from `load()` when g++ or libjpeg are unavailable; callers
(data/celeba.py) fall back to the PIL path. The decode is bit-identical to
PIL's (same libjpeg, default ISLOW IDCT); the resample matches PIL
Resampling.BILINEAR's scaled-support triangle filter to ±1 LSB
(tests/test_native_imageops.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imageops.cpp")
_SO = os.path.join(_DIR, "_imageops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           _SRC, "-ljpeg", "-o", _SO]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        print(f"[csl_gan_tpu] native imageops build failed:\n{res.stderr}")
        return False
    return True


def load():
    """The ctypes library handle, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.csl_decode_batch.restype = ctypes.c_int
        lib.csl_decode_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
        lib.csl_resample.restype = None
        lib.csl_resample.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def decode_batch(paths, im_size: int, n_threads: int = 0):
    """Decode+resize+crop a list of JPEG paths into one uint8 array.

    n_threads=0 means one per CPU. Raises RuntimeError if the native
    library is unavailable (callers should check available() first).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native imageops unavailable")
    n = len(paths)
    out = np.empty((n, im_size, im_size, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    buf = b"\0".join(p.encode() for p in paths) + b"\0"
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.csl_decode_batch(
        buf, n, im_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    return out, ok.astype(bool)


def resample(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """PIL-BILINEAR-compatible resample of an HWC uint8 RGB image."""
    lib = load()
    if lib is None:
        raise RuntimeError("native imageops unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    assert c == 3
    out = np.empty((out_h, out_w, 3), np.uint8)
    lib.csl_resample(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_w, out_h)
    return out
