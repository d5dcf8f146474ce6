"""Misc utilities (reference util.py:10-60 remainder).

The freeze/unfreeze/zero_grad helpers have no equivalent here — parameter
immutability is structural in the functional train steps (G params simply
aren't differentiated in the D step).
"""

from __future__ import annotations

import numpy as np
from scipy import stats


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
