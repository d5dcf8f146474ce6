"""Conv ghost clipping (ops/conv_ghost.py) must exactly reproduce the
generic vmap-materialized path for the DCResNet D real pass — summed grads
and norm stats, flat and per-layer, across the conditional architectures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csl_gan_tpu import options
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.ops import conv_ghost, grads as gops
from csl_gan_tpu.training.steps import TrainStepBuilder


def setup(tmp_path, *argv, bs=16):
    opt = options.parse(["MNIST", "--model", "DeepConvResNet", *argv,
                         "-o", str(tmp_path / "o"), "-bs", str(bs),
                         "--manual_seed", "17"])
    (G, Gv), (D, Dv) = init_models(opt)
    b = TrainStepBuilder(opt, G, D)
    return opt, b, b.init_state(Gv, Dv)


def batch(conditional, bs=16, n_classes=10):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(kx, (bs, 28, 28, 1), minval=-1, maxval=1)
    y = jax.random.randint(ky, (bs,), 0, n_classes) if conditional else None
    return x, y


def run_ghost(b, state, x, y, C, per_layer):
    concat = (b.conditional and b.arch != "ACGAN"
              and b.opt.d_label_emb_mode == "concat")
    return conv_ghost.dcresnet_real_ghost(
        state.d_params, x, y, n_classes=b.n_classes, arch=b.arch,
        aux_type=b.aux_type, aux_scalar=b.aux_scalar,
        row_w=b._row_weights(y) if b.conditional else None,
        concat_planes=concat, max_norm=C, per_layer=per_layer)


def assert_matches(b, state, x, y, C, per_layer):
    f, args = b._real_ps_args(x, y, b._row_weights(y) if b.conditional else None)
    want, want_stats = gops.clipped_grad_sum(
        f, state.d_params, *args, max_norm=C, per_layer=per_layer)
    got, got_stats, (out, aux_out) = run_ghost(b, state, x, y, C, per_layer)
    for a, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_stats.norm_mean),
                               np.asarray(want_stats.norm_mean),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_stats.norm_max),
                               np.asarray(want_stats.norm_max),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_stats.frac_clipped),
                               np.asarray(want_stats.frac_clipped), atol=1e-6)
    # Forward outputs (reused for metrics) match the model's.
    r_out, r_aux = b._d_apply(state.d_params, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(r_out),
                               rtol=1e-4, atol=1e-6)
    if r_aux is not None:
        np.testing.assert_allclose(np.asarray(aux_out), np.asarray(r_aux),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("argv,conditional", [
    ((), False),
    (("--conditional",), True),                                   # ACGAN + CE
    (("--conditional", "--aux_loss_type", "wasserstein"), True),  # ACGAN + W
    (("--conditional", "--conditional_arch", "CGAN"), True),      # planes
    (("--conditional", "--conditional_arch", "WCGAN"), True),     # class head
])
def test_conv_ghost_matches_generic(tmp_path, argv, conditional):
    opt, b, state = setup(tmp_path, "-dpm", "gc", *argv)
    assert b.use_conv_ghost
    x, y = batch(conditional)
    for C in (0.05, 1e6):  # everything clipped / nothing clipped
        assert_matches(b, state, x, y, C, per_layer=False)


def test_conv_ghost_per_layer(tmp_path):
    opt, b, state = setup(tmp_path, "-dpm", "gc", "--conditional",
                          "-gcm", "constant-pl")
    assert b.use_conv_ghost and b.per_layer
    x, y = batch(True)
    n_leaves = len(jax.tree_util.tree_leaves(state.d_params))
    C = jnp.linspace(0.01, 2.0, n_leaves)
    assert_matches(b, state, x, y, C, per_layer=True)


def test_conv_ghost_mixed_orders_agree(tmp_path):
    """The ghost (Gram) and direct (materialized) kernel-norm orders must
    agree with brute-force per-sample vjp norms, and the patches-einsum
    weighted sum must match the conv vjp (pins the channel-major patch
    layout)."""
    k = jax.random.PRNGKey(5)
    ka, kc, kw_ = jax.random.split(k, 3)
    a = jax.random.normal(ka, (4, 9, 9, 6))
    c = jax.random.normal(kc, (4, 5, 5, 8))
    u = conv_ghost._patches(a, 5, 5, 2, 2)
    c2 = c
    sq = conv_ghost._conv_kernel_sq_norms(u, c2)
    # brute force via per-sample vjp
    def one(ai, ci):
        kern = jnp.zeros((5, 5, 6, 8))
        _, vjp = jax.vjp(lambda kk: conv_ghost._conv(ai[None], kk, 2, 2), kern)
        (g,) = vjp(ci[None])
        return jnp.sum(g ** 2)
    want = jax.vmap(one)(a, c)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(want),
                               rtol=1e-4, atol=1e-6)

    # direct order (large spatial extent, small kernel — the roofline rule
    # picks the materialized [K, O] path here)
    a_d = jax.random.normal(ka, (2, 34, 34, 3))
    c_d = jax.random.normal(kc, (2, 17, 17, 4))
    u_d = conv_ghost._patches(a_d, 5, 5, 2, 2)
    sq_d = conv_ghost._conv_kernel_sq_norms(u_d, c_d)

    def one_d(ai, ci):
        kern = jnp.zeros((5, 5, 3, 4))
        _, vjp = jax.vjp(lambda kk: conv_ghost._conv(ai[None], kk, 2, 2), kern)
        (g,) = vjp(ci[None])
        return jnp.sum(g ** 2)
    np.testing.assert_allclose(np.asarray(sq_d),
                               np.asarray(jax.vmap(one_d)(a_d, c_d)),
                               rtol=1e-4, atol=1e-6)

    # weighted sum vs vjp with w-scaled cotangents
    w = jax.random.uniform(kw_, (4,), minval=0.1, maxval=1.0)
    got = conv_ghost._conv_kernel_weighted_sum(u, c2, w, (5, 5, 6, 8))
    kern = jnp.zeros((5, 5, 6, 8))
    _, vjp = jax.vjp(lambda kk: conv_ghost._conv(a, kk, 2, 2), kern)
    (want_sum,) = vjp(c * w[:, None, None, None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_sum),
                               rtol=1e-4, atol=1e-6)


def test_conv_ghost_full_step_matches_two_pass(tmp_path):
    """Full gc D-step with conv ghost on vs off (sigma=0)."""
    opt1, b1, s1 = setup(tmp_path, "-dpm", "gc", "--conditional", "--sigma", "0")
    opt2, b2, s2 = setup(tmp_path, "-dpm", "gc", "--conditional", "--sigma", "0")
    assert b1.use_conv_ghost
    b2.use_conv_ghost = False
    b2.use_two_pass = True
    x, y = batch(True)
    rng = jax.random.PRNGKey(4)
    n1, m1 = b1.d_step_dp(s1, x, y, x, y, x, y, rng)
    n2, m2 = b2.d_step_dp(s2, x, y, x, y, x, y, rng)
    for a, g in zip(jax.tree_util.tree_leaves(n1.d_params),
                    jax.tree_util.tree_leaves(n2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g),
                                   rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(float(m1["d_adv_loss"]),
                               float(m2["d_adv_loss"]), rtol=1e-4)
