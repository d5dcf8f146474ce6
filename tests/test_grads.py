"""Per-sample gradient / clip / noise machinery tests (ops/grads.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csl_gan_tpu.ops import grads as G


def make_problem(b=12, din=5, dout=3, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    params = {"w": jax.random.normal(k1, (din, dout)), "b": jnp.zeros((dout,))}
    x = jax.random.normal(k2, (b, din))
    y = jax.random.normal(k3, (b, dout))

    def loss(p, xi, yi):
        pred = xi @ p["w"] + p["b"]
        return jnp.sum((pred - yi) ** 2)

    return params, x, y, loss


def test_per_sample_grads_match_loop():
    params, x, y, loss = make_problem()
    ps = G.per_sample_grads(loss, params, x, y)
    for i in range(x.shape[0]):
        gi = jax.grad(loss)(params, x[i], y[i])
        np.testing.assert_allclose(np.asarray(ps["w"][i]), np.asarray(gi["w"]),
                                   rtol=1e-4, atol=1e-6)


def test_chunked_equals_unchunked():
    params, x, y, loss = make_problem(b=12)
    a = G.per_sample_grads(loss, params, x, y)
    b = G.per_sample_grads(loss, params, x, y, chunk=4)
    jax.tree.map(lambda u, v: np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-4, atol=1e-6), a, b)


def test_clipped_sum_flat_norm_bound():
    params, x, y, loss = make_problem()
    C = 0.5
    summed, stats = G.clipped_grad_sum(loss, params, x, y, max_norm=C)
    # Each clipped per-sample grad has norm <= C -> sum norm <= B*C.
    assert float(G.global_norm(summed)) <= x.shape[0] * C + 1e-5
    # Manual check against materialized implementation.
    ps = G.per_sample_grads(loss, params, x, y)
    flat = jnp.stack([jnp.sqrt(sum(jnp.sum(ps[k][i] ** 2) for k in ps))
                      for i in range(x.shape[0])])
    factors = jnp.minimum(1.0, C / (flat + 1e-12))
    want_w = jnp.sum(ps["w"] * factors[:, None, None], axis=0)
    np.testing.assert_allclose(np.asarray(summed["w"]), np.asarray(want_w), rtol=1e-5)


def test_clipped_sum_per_layer():
    params, x, y, loss = make_problem()
    Cs = [0.3, 0.1]  # leaves sorted: b, w (flax dict ordering: 'b' < 'w')
    summed, stats = G.clipped_grad_sum(loss, params, x, y, max_norm=Cs, per_layer=True)
    ps = G.per_sample_grads(loss, params, x, y)
    leaves = jax.tree_util.tree_leaves(ps)
    for leaf, got, C in zip(leaves, jax.tree_util.tree_leaves(summed), Cs):
        norms = jnp.sqrt(jnp.sum(leaf.reshape(leaf.shape[0], -1) ** 2, axis=1))
        f = jnp.minimum(1.0, C / (norms + 1e-12))
        want = jnp.sum(leaf * f.reshape((-1,) + (1,) * (leaf.ndim - 1)), axis=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_clipped_sum_chunked_matches():
    params, x, y, loss = make_problem(b=12)
    a, sa = G.clipped_grad_sum(loss, params, x, y, max_norm=0.7)
    b, sb = G.clipped_grad_sum(loss, params, x, y, max_norm=0.7, chunk=3)
    jax.tree.map(lambda u, v: np.testing.assert_allclose(
        np.asarray(u), np.asarray(v), rtol=1e-5), a, b)
    np.testing.assert_allclose(np.asarray(sa.norm_mean), np.asarray(sb.norm_mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sa.frac_clipped), np.asarray(sb.frac_clipped), rtol=1e-6)


def test_chunked_non_divisible_batch():
    """chunk need not divide the batch (the --poisson static buffer
    B+ceil(8*sqrt(B)) rarely does): pad rows are masked out of the sum and
    the stats."""
    params, x, y, loss = make_problem(b=13)
    a = G.per_sample_grads(loss, params, x, y)
    b = G.per_sample_grads(loss, params, x, y, chunk=4)
    jax.tree.map(lambda u, v: np.testing.assert_allclose(
        np.asarray(u), np.asarray(v), rtol=1e-4, atol=1e-6), a, b)
    sa, ssa = G.clipped_grad_sum(loss, params, x, y, max_norm=0.7)
    sb, ssb = G.clipped_grad_sum(loss, params, x, y, max_norm=0.7, chunk=4)
    jax.tree.map(lambda u, v: np.testing.assert_allclose(
        np.asarray(u), np.asarray(v), rtol=1e-5), sa, sb)
    np.testing.assert_allclose(np.asarray(ssa.norm_mean),
                               np.asarray(ssb.norm_mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ssa.frac_clipped),
                               np.asarray(ssb.frac_clipped), rtol=1e-6)


def test_clip_stats():
    params, x, y, loss = make_problem()
    # Huge threshold: nothing clipped.
    _, stats = G.clipped_grad_sum(loss, params, x, y, max_norm=1e9)
    np.testing.assert_allclose(np.asarray(stats.frac_clipped), 0.0)
    # Tiny threshold: everything clipped.
    _, stats2 = G.clipped_grad_sum(loss, params, x, y, max_norm=1e-6)
    np.testing.assert_allclose(np.asarray(stats2.frac_clipped), 1.0)
    assert stats.norm_mean.shape == (2,)  # one entry per leaf


def test_gaussian_noise_scale():
    key = jax.random.PRNGKey(0)
    tree = {"a": jnp.zeros((50000,)), "b": jnp.zeros((50000,))}
    sigma, C = 2.0, 3.0
    noised = G.add_gaussian_noise(key, tree, sigma, C)
    for leaf in jax.tree_util.tree_leaves(noised):
        assert float(jnp.std(leaf)) == pytest.approx(sigma * C, rel=0.05)
    # Per-layer mode: per-leaf stds sigma*C_l.
    noised2 = G.add_gaussian_noise(key, tree, sigma, [1.0, 5.0], per_layer=True)
    stds = [float(jnp.std(l)) for l in jax.tree_util.tree_leaves(noised2)]
    assert stds[0] == pytest.approx(sigma * 1.0, rel=0.05)
    assert stds[1] == pytest.approx(sigma * 5.0, rel=0.05)


def test_noise_traced_max_norm():
    # Adaptive clipping passes a traced C — must work under jit.
    tree = {"a": jnp.zeros((100,))}

    @jax.jit
    def f(key, C):
        return G.add_gaussian_noise(key, tree, 1.0, C)

    out = f(jax.random.PRNGKey(1), jnp.asarray(2.5))
    assert np.isfinite(np.asarray(out["a"])).all()


def test_two_pass_matches_one_pass():
    params, x, y, loss = make_problem(b=16)
    for C in [0.3, 1e6]:
        a, sa = G.clipped_grad_sum(loss, params, x, y, max_norm=C)
        b, sb = G.two_pass_clipped_grad_sum(loss, params, x, y, max_norm=C)
        jax.tree.map(lambda u, v: np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=1e-4, atol=1e-6), a, b)
        np.testing.assert_allclose(np.asarray(sa.norm_mean),
                                   np.asarray(sb.norm_mean), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sa.frac_clipped),
                                   np.asarray(sb.frac_clipped), atol=1e-6)


def test_two_pass_per_layer_fallback():
    params, x, y, loss = make_problem(b=8)
    a, _ = G.clipped_grad_sum(loss, params, x, y, max_norm=[0.2, 0.1],
                              per_layer=True)
    b, _ = G.two_pass_clipped_grad_sum(loss, params, x, y,
                                       max_norm=[0.2, 0.1], per_layer=True)
    jax.tree.map(lambda u, v: np.testing.assert_allclose(
        np.asarray(u), np.asarray(v), rtol=1e-4, atol=1e-6), a, b)
