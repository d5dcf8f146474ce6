"""RDP accountant tests.

Parity target (SURVEY.md §7): epsilon must match the Opacus sampled-Gaussian
RDP computation for the same (q, sigma, steps, orders). Since the fork is not
installed here, correctness is established against (a) the analytically-known
full-batch Gaussian case, (b) direct numerical integration of the SGM Renyi
divergence, and (c) continuity between the integer and fractional-alpha code
paths.
"""

import math

import numpy as np
import pytest
from scipy import integrate, stats

from csl_gan_tpu.privacy import rdp
from csl_gan_tpu.privacy.accountant import RdpAccountant


def numerical_rdp(q, sigma, alpha):
    """Direct numerical integral of the SGM Renyi divergence.

    A_alpha = E_{z~mu0}[ (mu(z)/mu0(z))^alpha ], mu = (1-q) mu0 + q mu1,
    mu0 = N(0, sigma^2), mu1 = N(1, sigma^2).
    """

    def integrand(z):
        # exp((1-alpha) log mu0 + alpha log mu), computed in log space to
        # survive the tails.
        logp0 = stats.norm.logpdf(z, 0, sigma)
        logp1 = stats.norm.logpdf(z, 1, sigma)
        logmu = np.logaddexp(math.log(1 - q) + logp0, math.log(q) + logp1)
        return math.exp((1 - alpha) * logp0 + alpha * logmu)

    val, _ = integrate.quad(integrand, -20 * sigma, 20 * sigma, limit=500)
    return math.log(val) / (alpha - 1)


@pytest.mark.parametrize("q,sigma,alpha", [
    (0.01, 1.1, 4),
    (0.01, 1.1, 4.5),
    (0.1, 2.0, 8),
    (0.1, 2.0, 8.7),
    (0.004, 5.0, 32),
    (0.5, 0.8, 2.5),
])
def test_rdp_matches_numerical_integration(q, sigma, alpha):
    got = rdp.compute_rdp(q, sigma, 1, alpha)
    want = numerical_rdp(q, sigma, alpha)
    assert got == pytest.approx(want, rel=1e-6)


def test_full_batch_is_pure_gaussian():
    # q=1: RDP = alpha / (2 sigma^2) exactly.
    for alpha in [1.5, 2, 10, 64]:
        assert rdp.compute_rdp(1.0, 2.0, 1, alpha) == pytest.approx(alpha / 8.0)


def test_zero_sampling_rate_is_free():
    assert rdp.compute_rdp(0.0, 1.0, 100, 8) == 0.0


def test_integer_fractional_continuity():
    # The two code paths must agree to high precision near integers.
    for alpha in [3, 7, 15]:
        a = rdp.compute_rdp(0.02, 1.3, 1, alpha)
        b = rdp.compute_rdp(0.02, 1.3, 1, alpha + 1e-9)
        assert a == pytest.approx(b, rel=1e-5)


def test_linear_in_steps():
    one = rdp.compute_rdp(0.01, 1.1, 1, [2, 8, 32])
    many = rdp.compute_rdp(0.01, 1.1, 250, [2, 8, 32])
    np.testing.assert_allclose(many, 250 * one, rtol=1e-12)


def test_get_privacy_spent_classic_conversion():
    orders = [2.0, 4.0, 8.0]
    r = np.array([0.1, 0.15, 0.5])
    eps, best = rdp.get_privacy_spent(orders, r, delta=1e-5)
    manual = r - math.log(1e-5) / (np.array(orders) - 1)
    assert eps == pytest.approx(manual.min())
    assert best == orders[int(np.argmin(manual))]


def test_published_dpsgd_mnist_epsilon():
    """The canonical published DP-SGD MNIST point (TF-Privacy tutorial /
    Abadi-style accounting): N=60000, batch 256, noise 1.1, 60 epochs,
    delta 1e-5 => eps ~= 3.0 with the classic RDP conversion the Opacus fork
    used. Pins the whole accountant against a published external value."""
    q = 256 / 60000
    steps = 60 * 60000 / 256
    orders = [1 + x / 10.0 for x in range(1, 100)] + list(range(12, 64))
    r = rdp.compute_rdp(q, 1.1, steps, orders)
    eps, alpha = rdp.get_privacy_spent(orders, r, 1e-5)
    assert eps == pytest.approx(3.0, abs=0.03)


def test_default_operating_points_sane():
    # MNIST default: bs 600 / 60000, sigma 5.0 (options.py:11-47).
    acc = RdpAccountant(batch_size=600, sample_size=60000, noise_multiplier=5.0)
    acc.steps = 100 * 100  # 100 epochs
    eps, alpha = acc.get_privacy_spent(1e-5)
    assert 0 < eps < 5  # strong privacy at sigma=5
    # More steps -> more epsilon.
    acc2 = RdpAccountant(batch_size=600, sample_size=60000, noise_multiplier=5.0)
    acc2.steps = 200 * 100
    eps2, _ = acc2.get_privacy_spent(1e-5)
    assert eps2 > eps


def test_accountant_state_roundtrip():
    acc = RdpAccountant(batch_size=128, sample_size=180000, noise_multiplier=0.5)
    acc.step(1234)
    acc2 = RdpAccountant.from_state_dict(acc.state_dict())
    assert acc2.get_privacy_spent(1e-6) == acc.get_privacy_spent(1e-6)


def test_mean_sampler_accounting_formula():
    # mean_sampler.py:86-92: sensitivity derived from pixel sensitivity.
    mean_size, res, ch, noise_std = 5000, 64, 3, 0.22
    pixel_sens = 1 / mean_size / 2
    l2_sens = np.sqrt(ch * res ** 2 * pixel_sens ** 2)
    r = rdp.compute_rdp(5000 / 60000, noise_std / l2_sens, 10, rdp.DEFAULT_ALPHAS)
    eps, _ = rdp.get_privacy_spent(rdp.DEFAULT_ALPHAS, r, 1e-5)
    assert np.isfinite(eps) and eps > 0


def test_sampling_rate_above_one_rejected():
    """q > 1 is undefined for the sampled-Gaussian bound; the old code died
    deep inside the fractional-alpha series with a bare math domain error
    (found by a verify drive of budget_analysis.py on a bs>tss config)."""
    import pytest

    with pytest.raises(ValueError, match="q=1.2"):
        rdp.compute_rdp(1.2, 5.0, 1, rdp.DEFAULT_ALPHAS)
