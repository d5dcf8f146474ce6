"""Misc utilities (reference util.py:10-60 remainder).

The freeze/unfreeze/zero_grad helpers have no equivalent here — parameter
immutability is structural in the functional train steps (G params simply
aren't differentiated in the D step).
"""

from __future__ import annotations

import os

import numpy as np
from scipy import stats


def _host_fingerprint() -> str:
    """Short hash of this host's CPU feature set.

    The XLA:CPU cache stores AOT-compiled machine code; loading an entry
    compiled on a host with wider vector features (the environment can move
    between machines across sessions) risks SIGILL. Keying the cache dir by
    the CPU flags makes entries from a different machine invisible instead.
    """
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = "unknown"
    except OSError:
        feats = "unknown"
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache for this process.

    Makes reruns of train.py/bench.py/tools skip recompiles wherever the
    backend supports executable serialization (CPU/standard TPU runtimes;
    the tunneled remote-compile backend in this environment does not, and
    simply doesn't cache). Safe no-op otherwise. Disable with
    CSL_GAN_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("CSL_GAN_NO_COMPILE_CACHE"):
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "CSL_GAN_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~/.cache/csl_gan_tpu"),
                         f"jax_cache-{_host_fingerprint()}"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception as e:  # never block training on cache setup
        print(f"[csl_gan_tpu] compilation cache disabled: {e}")


def add_slash(path):
    """(reference util.py:10-11)"""
    return None if path is None else (path if path.endswith("/") else path + "/")


def max_batch_size_for_sample_rate(sample_rate: float,
                                   train_set_size: int = 180000,
                                   acceptable_risk_per_batch: float = 0.002) -> int:
    """Normal-approximation bound on Poisson-subsampled batch size
    (reference util.py:44-50, with its missing-numpy-import bug fixed)."""
    mu = train_set_size * sample_rate
    sigma = np.sqrt(train_set_size * sample_rate * (1 - sample_rate))
    return int(stats.norm.ppf(1 - acceptable_risk_per_batch, loc=mu, scale=sigma)) + 1
