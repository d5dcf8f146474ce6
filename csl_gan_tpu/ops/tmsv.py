"""Trimmed-mean / sign-vote DP aggregation (the experimental tm/sv engines).

Replicates the observable contract of the fork's TMPrivacyEngine /
SVPrivacyEngine (reference train.py:118-133, 419-421): per-coordinate robust
aggregation of per-sample gradients with smooth-sensitivity-calibrated noise,
budgeted in zCDP (rho per step).

Pulled out of training/steps.py so the privacy-critical math is directly
unit-testable (tests/test_tmsv.py pins the smooth-sensitivity bound, the
noise scales, and the zCDP conversion numerically — VERDICT round-2 item 3).

Math notes
----------
Trimmed mean (per coordinate): values are clipped to [min_val, max_val],
sorted, the m smallest and m largest dropped, the rest averaged. The noise
scale is the t-smooth sensitivity (Nissim-Raskhodnikova-Smith 2007):

    S(x) = max_k e^{-t k} * A_k(x),   A_k = worst-case local sensitivity at
                                            Hamming distance k

For the trimmed mean, A_k is the worst LS over datasets y at distance k,
and LS(y) itself involves ONE more change — so the kept window of the
sorted, clipped values can slide by up to k+1 positions in each direction,
and slid-out positions can hold values at the clip extremes (replaced
samples). With Z = z padded by m+1 copies of min_val below and max_val
above (indices relative to z):

    A_k <= (Z[B-m-1 + (k+1)] - Z[m - (k+1)]) / n_keep

(The first version of this bound allowed only a k-slide within z itself;
tests/test_tmsv.py's exhaustive neighbor enumeration caught it
under-covering one-sample swaps — e.g. sorted z = [-1, -.57, -.27, -.23,
.04, .98, 1, 1], m=1: replacing a kept sample with the clip min shifts the
mean by (z[7]-z[0])/6 = 0.3333 > the old S = 0.3171.)

This padded form is (a) pointwise >= LS (the k=0 term covers every
one-sample swap) and (b) t-smooth: order statistics of neighbors differ by
at most one position, so B_k(x) <= B_{k+1}(x') and
S(x) <= e^t S(x') — both properties are pinned empirically by
tests/test_tmsv.py. Student-t (df=3) noise scaled by S / sqrt(2 rho) gives
the per-step rho budget (the smooth-sensitivity mechanism; the fork's
TMPrivacyEngine internals are unobservable, SURVEY.md §2.1 — this keeps
its ctor contract with an explicitly validated bound).

Sign vote (per coordinate): vote = sum_i sign(g_i); one sample changes the
vote by at most 2 (L2 sensitivity 2 per coordinate... per the fork's flat
accounting), so Gaussian noise with std = 2 / sqrt(2 rho) gives rho-zCDP
per step; the noisy vote is divided by the batch size to act as a gradient.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sv_noise_std(rho_per_step: float) -> float:
    """Gaussian std for the sign-vote mechanism: sensitivity 2 (one sample
    flips its sign contribution by at most |+1 - (-1)|), rho-zCDP per step
    via std = sensitivity / sqrt(2 rho). Pure host math (jit-safe as a
    trace-time constant)."""
    return 2.0 / math.sqrt(2.0 * rho_per_step)


def sign_vote(g, key, rho_per_step: float):
    """Noisy per-coordinate sign vote of per-sample grads g [B, ...],
    normalized by B (the fork's vote_on_grads contract)."""
    b = g.shape[0]
    vote = jnp.sum(jnp.sign(g), axis=0)
    noisy = vote + sv_noise_std(rho_per_step) * jax.random.normal(
        key, vote.shape)
    return noisy / b


def trimmed_mean_sensitivity(z, m: int, t: float,
                             min_val: float, max_val: float):
    """t-smooth sensitivity bound of the m-trimmed mean, per coordinate.

    z: the SORTED, CLIPPED per-sample values [B, ...] (sorted along axis 0).
    Returns S with the batch axis reduced (shape z.shape[1:]).
    """
    b = z.shape[0]
    n_keep = b - 2 * m
    pad = m + 1  # largest endpoint slide any term uses
    terms = []
    for k in range(0, m + 1):
        s_k = min(k + 1, pad)  # distance k + LS's own change
        ub = b - m - 1 + s_k   # z-relative; >= b means a max_val pad slot
        lb = m - s_k           # < 0 means a min_val pad slot
        hi = jnp.full(z.shape[1:], max_val, z.dtype) if ub > b - 1 else z[ub]
        lo = jnp.full(z.shape[1:], min_val, z.dtype) if lb < 0 else z[lb]
        terms.append(jnp.exp(-t * k) * (hi - lo) / n_keep)
    # k > m terms are dominated: at k = m both endpoints are already in the
    # padding (full clipped range) and further terms only add discount.
    return jnp.max(jnp.stack(terms), axis=0)


def trimmed_mean(g, key, m: int, min_val: float, max_val: float,
                 t: float, rho_per_step: float):
    """Per-coordinate m-trimmed mean of per-sample grads g [B, ...] with
    smooth-sensitivity-scaled Student-t (df=3) noise."""
    b = g.shape[0]
    m = min(m, (b - 1) // 2)
    z = jnp.sort(jnp.clip(g, min_val, max_val), axis=0)
    mean = jnp.mean(z[m:b - m], axis=0)
    s = trimmed_mean_sensitivity(z, m, t, min_val, max_val)
    scale = s / jnp.sqrt(2.0 * rho_per_step)
    return mean + jax.random.t(key, 3.0, mean.shape) * scale
