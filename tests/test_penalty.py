"""Gradient penalty tests (training/penalty.py vs manual math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csl_gan_tpu.training import penalty as P


def linear_d(w):
    """D(x) = x @ w: input-gradient is w for every sample."""
    def apply(params, x, y):
        out = x.reshape(x.shape[0], -1) @ params["w"]
        return out, None
    return apply


def test_lipschitz_penalty_linear_model_exact():
    # For D(x) = w.x the per-sample input grad is w; penalty = 10*(|w|-1)^2.
    w = jnp.array([[0.6], [0.8], [0.0]])  # |w| = 1.0 -> penalty 0
    apply = linear_d(w)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    p = P.lipschitz_penalty_wrt(apply, {"w": w}, x, None)
    assert float(p) == pytest.approx(0.0, abs=1e-9)

    w2 = w * 3.0  # |w| = 3 -> (3-1)^2 = 4 per sample -> weight 10 not applied here
    p2 = P.lipschitz_penalty_wrt(linear_d(w2), {"w": w2}, x, None)
    assert float(p2) == pytest.approx(4.0, rel=1e-6)


def test_one_sided_clamps_below_one():
    w = jnp.array([[0.3], [0.0], [0.0]])  # |w| = 0.3 < 1
    apply = linear_d(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    two = P.lipschitz_penalty_wrt(apply, {"w": w}, x, None, one_sided=False)
    one = P.lipschitz_penalty_wrt(apply, {"w": w}, x, None, one_sided=True)
    assert float(two) == pytest.approx(0.49, rel=1e-5)
    assert float(one) == pytest.approx(0.0, abs=1e-9)


def test_wgan_gp_interpolates_weighting():
    w = jnp.array([[2.0], [0.0]])
    apply = linear_d(w)
    real = jnp.ones((6, 2))
    fake = jnp.zeros((6, 2))
    p = P.wgan_gp_penalty(apply, {"w": w}, real, None, fake, None,
                          jax.random.PRNGKey(2))
    # gradient norm == |w| == 2 regardless of interpolation point -> 10*(2-1)^2
    assert float(p) == pytest.approx(10.0, rel=1e-5)


def test_aux_penalty_adds_terms():
    def apply(params, x, y):
        flat = x.reshape(x.shape[0], -1)
        return flat @ params["w"], flat @ params["aux"]

    params = {"w": jnp.array([[1.0], [0.0]]),
              "aux": jnp.array([[2.0, 0.0], [0.0, 2.0]])}
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 2))
    base = P.lipschitz_penalty_wrt(apply, params, x, None, aux_penalty=False,
                                   n_classes=2)
    with_aux = P.lipschitz_penalty_wrt(apply, params, x, None, aux_penalty=True,
                                       n_classes=2)
    # main head: |w|=1 -> 0; each aux column norm 2 -> (2-1)^2 = 1 each
    assert float(base) == pytest.approx(0.0, abs=1e-9)
    assert float(with_aux) == pytest.approx(2.0, rel=1e-5)


def test_calc_penalty_weights_average():
    w = jnp.array([[3.0], [0.0]])
    apply = linear_d(w)
    x = jnp.ones((4, 2))
    f = jnp.zeros((4, 2))
    single = P.calc_penalty(apply, {"w": w}, ["WGAN-GP"], x, None, f, None,
                            jax.random.PRNGKey(4))
    double = P.calc_penalty(apply, {"w": w}, ["WGAN-GP", "WGAN-GP1"], x, None,
                            f, None, jax.random.PRNGKey(4))
    # both types give 10*(3-1)^2 = 40 here; average of two = 40 as well
    assert float(single) == pytest.approx(40.0, rel=1e-5)
    assert float(double) == pytest.approx(40.0, rel=1e-5)


def test_per_sample_shape():
    w = jnp.array([[1.5], [0.0]])
    apply = linear_d(w)
    x = jnp.ones((7, 2))
    ps = P.lipschitz_penalty_wrt(apply, {"w": w}, x, None, per_sample=True)
    assert ps.shape == (7,)
    np.testing.assert_allclose(np.asarray(ps), 0.25, rtol=1e-5)
