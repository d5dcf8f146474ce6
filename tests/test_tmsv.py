"""Math-level tests for the experimental tm/sv engines and zCDP accounting.

Promotes the trimmed-mean / sign-vote paths from "runs" to "verified"
(VERDICT round-2 item 3): the smooth-sensitivity bound actually bounds
neighboring-dataset output shifts, the bound formula matches an independent
brute-force window-slide evaluation, the sign-vote noise is calibrated to
2/sqrt(2 rho), and the zCDP -> (eps, delta) conversion is pinned against
hand-computed values.

Reference contract: train.py:118-133 (engine ctor params), 419-421
(trim_grads / vote_on_grads call sites).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csl_gan_tpu.ops import tmsv
from csl_gan_tpu.privacy.accountant import (ZcdpAccountant,
                                            accountant_from_state_dict)

MIN_V, MAX_V = -1.0, 1.0
T = 0.05


def np_trimmed_mean(x, m):
    z = np.sort(np.clip(x, MIN_V, MAX_V))
    return float(np.mean(z[m:len(z) - m]))


def np_sensitivity(x, m, t):
    """Independent numpy evaluation of the t-smooth window-slide bound:
    an explicitly PADDED sorted array (slid-out window positions can hold
    clip-extreme replaced values) and an explicit max over k and the
    (up, down) slide extents, instead of the closed-form index arithmetic
    in tmsv.trimmed_mean_sensitivity. At distance k the endpoints slide up
    to k+1 positions (the +1 is LS's own sample change)."""
    b = len(x)
    n_keep = b - 2 * m
    pad = m + 1
    z = np.concatenate([np.full(pad, MIN_V),
                        np.sort(np.clip(x, MIN_V, MAX_V)),
                        np.full(pad, MAX_V)])
    best = 0.0
    for k in range(0, m + 1):
        for up in range(0, min(k + 1, pad) + 1):
            for down in range(0, min(k + 1, pad) + 1):
                ub = pad + b - m - 1 + up
                lb = pad + m - down
                best = max(best, math.exp(-t * k) * (z[ub] - z[lb]) / n_keep)
    return best


def test_sensitivity_matches_bruteforce_window_slides():
    rng = np.random.default_rng(0)
    for b, m in [(8, 1), (8, 3), (16, 2), (16, 7), (5, 2), (30, 10)]:
        for _ in range(20):
            x = rng.uniform(-2, 2, size=b)  # exercises clipping too
            z = jnp.sort(jnp.clip(jnp.asarray(x)[:, None], MIN_V, MAX_V),
                         axis=0)
            s_impl = float(tmsv.trimmed_mean_sensitivity(
                z, m, T, MIN_V, MAX_V)[0])
            s_bf = np_sensitivity(x, m, T)
            np.testing.assert_allclose(s_impl, s_bf, rtol=1e-6)


def test_neighbor_shift_bounded_by_smooth_sensitivity():
    """For every dataset x' at Hamming distance 1 from x,
    |tm(x') - tm(x)| <= S(x): the smooth sensitivity dominates the local
    sensitivity (its k=0/k=1 window-slide terms cover every one-sample
    swap), so noise scaled to S is always enough for the mechanism's
    accounting. Checked exhaustively over a replacement grid including the
    clip extremes."""
    rng = np.random.default_rng(1)
    grid = np.concatenate([np.linspace(-2.5, 2.5, 41), [MIN_V, MAX_V]])
    for b, m in [(8, 1), (8, 3), (12, 2), (12, 5), (7, 3)]:
        for trial in range(10):
            x = rng.uniform(-1.5, 1.5, size=b)
            z = jnp.sort(jnp.clip(jnp.asarray(x)[:, None], MIN_V, MAX_V),
                         axis=0)
            s = float(tmsv.trimmed_mean_sensitivity(z, m, T, MIN_V, MAX_V)[0])
            tm_x = np_trimmed_mean(x, m)
            worst = 0.0
            for i in range(b):
                for v in grid:
                    xp = x.copy()
                    xp[i] = v
                    worst = max(worst, abs(np_trimmed_mean(xp, m) - tm_x))
            assert worst <= s + 1e-9, (b, m, trial, worst, s)


def test_sensitivity_is_t_smooth():
    """S(x) <= e^t * S(x') for neighboring datasets — the defining property
    of a smooth upper bound (without it the smooth-sensitivity mechanism's
    privacy argument collapses). Checked over random one-sample swaps."""
    rng = np.random.default_rng(4)

    def S(x, m):
        z = jnp.sort(jnp.clip(jnp.asarray(x)[:, None], MIN_V, MAX_V), axis=0)
        return float(tmsv.trimmed_mean_sensitivity(z, m, T, MIN_V, MAX_V)[0])

    for b, m in [(8, 1), (8, 3), (12, 2), (16, 5)]:
        for _ in range(30):
            x = rng.uniform(-1.5, 1.5, size=b)
            i = rng.integers(0, b)
            xp = x.copy()
            xp[i] = rng.uniform(-3, 3)
            assert S(x, m) <= math.exp(T) * S(xp, m) + 1e-6
            assert S(xp, m) <= math.exp(T) * S(x, m) + 1e-6


def test_trimmed_mean_value_and_noise_scale():
    """tmsv.trimmed_mean returns the clipped window mean plus Student-t(3)
    noise with scale S/sqrt(2 rho): checked by (a) the zero-noise limit via
    rho -> inf, (b) the empirical spread of many draws matching the scale
    (t(3) has std sqrt(3); the median absolute value ~0.7649*scale is used
    for a heavy-tail-robust check)."""
    rng = np.random.default_rng(2)
    b, m, rho = 16, 3, 0.125
    g = jnp.asarray(rng.uniform(-2, 2, size=(b, 4)), jnp.float32)
    # (a) rho -> inf: pure trimmed mean.
    out = tmsv.trimmed_mean(g, jax.random.PRNGKey(0), m, MIN_V, MAX_V, T,
                            1e30)
    want = [np_trimmed_mean(np.asarray(g)[:, j], m) for j in range(4)]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)
    # (b) noise scale: draws across many keys, per coordinate.
    z = jnp.sort(jnp.clip(g, MIN_V, MAX_V), axis=0)
    s = np.asarray(tmsv.trimmed_mean_sensitivity(z, m, T, MIN_V, MAX_V))
    scale = s / math.sqrt(2 * rho)
    draws = np.stack([np.asarray(tmsv.trimmed_mean(
        g, jax.random.PRNGKey(k), m, MIN_V, MAX_V, T, rho)) for k in range(4000)])
    resid = draws - np.asarray(want)[None, :]
    # median(|t_3|) = 0.7649 (from the t CDF); 4000 draws -> ~3% accuracy.
    med = np.median(np.abs(resid), axis=0)
    np.testing.assert_allclose(med, 0.7649 * scale, rtol=0.08)


def test_sign_vote_noise_std_formula():
    assert tmsv.sv_noise_std(0.5) == pytest.approx(2.0)
    assert tmsv.sv_noise_std(2.0) == pytest.approx(1.0)
    rho = 0.03
    assert tmsv.sv_noise_std(rho) == pytest.approx(2.0 / math.sqrt(2 * rho))


def test_sign_vote_value_and_noise_distribution():
    """vote = sum(sign(g)) with N(0, (2/sqrt(2 rho))^2) noise, divided by B."""
    rng = np.random.default_rng(3)
    b, rho = 32, 0.5
    g = jnp.asarray(rng.normal(size=(b, 8)), jnp.float32)
    vote = np.sum(np.sign(np.asarray(g)), axis=0)
    draws = np.stack([np.asarray(tmsv.sign_vote(g, jax.random.PRNGKey(k), rho))
                      for k in range(3000)])
    resid = draws * b - vote[None, :]
    np.testing.assert_allclose(np.mean(resid), 0.0, atol=0.15)
    np.testing.assert_allclose(np.std(resid), tmsv.sv_noise_std(rho),
                               rtol=0.05)


def test_zcdp_eps_pinned_values():
    """eps(rho, delta) = rho + 2 sqrt(rho ln(1/delta)), hand-computed:
    rho=1, delta=1e-5: eps = 1 + 2 sqrt(ln(1e5)) = 1 + 2*3.39307... """
    acc = ZcdpAccountant(rho_per_step=0.5)
    acc.step(2)  # rho = 1
    eps, rho = acc.get_privacy_spent(1e-5)
    assert rho == pytest.approx(1.0)
    assert eps == pytest.approx(1.0 + 2.0 * math.sqrt(math.log(1e5)),
                                rel=1e-12)
    # rho = 0.1, delta = 1e-6
    acc2 = ZcdpAccountant(rho_per_step=0.01)
    acc2.step(10)
    eps2, _ = acc2.get_privacy_spent(1e-6)
    assert eps2 == pytest.approx(0.1 + 2.0 * math.sqrt(0.1 * math.log(1e6)),
                                 rel=1e-12)
    # Composition is linear in rho: doubling the steps doubles rho.
    acc2.step(10)
    _, rho2 = acc2.get_privacy_spent(1e-6)
    assert rho2 == pytest.approx(0.2)
    # Zero steps: zero cost.
    assert ZcdpAccountant(rho_per_step=1.0).get_privacy_spent(1e-5) == (0.0, 0.0)


def test_zcdp_state_roundtrip():
    acc = ZcdpAccountant(rho_per_step=0.25)
    acc.step(7)
    acc2 = accountant_from_state_dict(acc.state_dict())
    assert isinstance(acc2, ZcdpAccountant)
    assert acc2.get_privacy_spent(1e-5) == acc.get_privacy_spent(1e-5)
    assert acc2.state_dict() == acc.state_dict()
