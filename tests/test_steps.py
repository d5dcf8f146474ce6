"""Train-step correctness tests (training/steps.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csl_gan_tpu import options
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.training.steps import TrainStepBuilder


def make(tmp_path, *argv, bs=16):
    opt = options.parse(list(argv) + ["-o", str(tmp_path / "o"), "-bs", str(bs),
                                      "--manual_seed", "11"])
    (G, Gv), (D, Dv) = init_models(opt)
    builder = TrainStepBuilder(opt, G, D)
    state = builder.init_state(Gv, Dv)
    return opt, builder, state


def batch(key, b=16, conditional=True):
    kx, ky = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.uniform(kx, (b, 28, 28, 1))
    y = jax.random.randint(ky, (b,), 0, 10) if conditional else None
    return x, y


def leaves(t):
    return jax.tree_util.tree_leaves(t)


def test_plain_step_updates_d_only(tmp_path):
    opt, builder, state = make(tmp_path, "MNIST")
    x, _ = batch(0, conditional=False)
    # Steps donate the input state, so snapshot to host before stepping.
    d_before = jax.device_get(state.d_params)
    g_before = jax.device_get(state.g_params)
    new_state, m = builder.d_step_plain(state, x, None, x, None,
                                        jax.random.PRNGKey(1))
    assert float(m["d_adv_loss"]) > 0
    # D changed, G unchanged.
    assert not all(np.allclose(a, b) for a, b in
                   zip(leaves(d_before), leaves(new_state.d_params)))
    assert all(np.allclose(a, b) for a, b in
               zip(leaves(g_before), leaves(new_state.g_params)))


def test_g_step_updates_g_only(tmp_path):
    opt, builder, state = make(tmp_path, "MNIST")
    d_before = jax.device_get(state.d_params)
    g_before = jax.device_get(state.g_params)
    new_state, m = builder.g_step(state, jax.random.PRNGKey(2))
    assert float(m["g_adv_loss"]) > 0
    assert not all(np.allclose(a, b) for a, b in
                   zip(leaves(g_before), leaves(new_state.g_params)))
    assert all(np.allclose(a, b) for a, b in
               zip(leaves(d_before), leaves(new_state.d_params)))


def test_gc_sigma0_bigclip_matches_plain(tmp_path):
    """With sigma=0 and a huge clip threshold, the gc step must produce the
    same D update as the non-private step (same rng => same fake batch)."""
    opt_gc, builder_gc, state_gc = make(tmp_path, "MNIST", "-dpm", "gc",
                                        "--sigma", "0", "-c", "1e9")
    opt_pl, builder_pl, state_pl = make(tmp_path, "MNIST")
    x, _ = batch(3, conditional=False)
    rng = jax.random.PRNGKey(4)
    s_gc, m_gc = builder_gc.d_step_dp(state_gc, x, None, x, None, x, None, rng)
    s_pl, m_pl = builder_pl.d_step_plain(state_pl, x, None, x, None, rng)
    for a, b in zip(leaves(s_gc.d_params), leaves(s_pl.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
    assert float(m_gc["frac_clipped"].max()) == 0.0


def test_gc_split_vs_accum_equal_without_clipping(tmp_path):
    """grad_clip_split=True vs False agree when nothing clips (sigma=0)."""
    o1, b1, s1 = make(tmp_path, "MNIST", "-dpm", "gc", "--sigma", "0",
                      "-c", "1e9", "-gcs", "true", "--conditional")
    o2, b2, s2 = make(tmp_path, "MNIST", "-dpm", "gc", "--sigma", "0",
                      "-c", "1e9", "-gcs", "false", "--conditional")
    x, y = batch(5)
    rng = jax.random.PRNGKey(6)
    n1, _ = b1.d_step_dp(s1, x, y, x, y, x, y, rng)
    n2, _ = b2.d_step_dp(s2, x, y, x, y, x, y, rng)
    for a, b in zip(leaves(n1.d_params), leaves(n2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_gc_noise_applied(tmp_path):
    """sigma>0 changes the update vs sigma=0 with identical rng."""
    _, b0, s0 = make(tmp_path, "MNIST", "-dpm", "gc", "--sigma", "0")
    _, b5, s5 = make(tmp_path, "MNIST", "-dpm", "gc", "--sigma", "5")
    x, _ = batch(7, conditional=False)
    rng = jax.random.PRNGKey(8)
    n0, _ = b0.d_step_dp(s0, x, None, x, None, x, None, rng)
    n5, _ = b5.d_step_dp(s5, x, None, x, None, x, None, rng)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(leaves(n0.d_params), leaves(n5.d_params))]
    assert max(diffs) > 1e-6


def test_gc_per_layer_clipping_param_order(tmp_path):
    """Per-layer C vector is remapped from torch order into leaf order."""
    cpl = ["1.0", "2.0", "3.0", "4.0", "5.0", "6.0"]
    opt, builder, state = make(tmp_path, "MNIST", "-dpm", "gc", "--conditional",
                               "-gcm", "constant-pl", "-cpl", *cpl)
    # MNIST cond D torch order: lin1.w, lin1.b, lin2.w, lin2.b, aux.w, aux.b
    # leaf (sorted) order: lin1.b, lin1.w, lin2.b, lin2.w, aux.b, aux.w
    np.testing.assert_allclose(np.asarray(state.clipping),
                               [2.0, 1.0, 4.0, 3.0, 6.0, 5.0])


def test_adaptive_clipping_updates_state(tmp_path):
    opt, builder, state = make(tmp_path, "MNIST", "-dpm", "gc",
                               "-gcm", "adaptive-pl", "--conditional",
                               "-nms", "1", "--mean_sample_size", "10")
    x, y = batch(9)
    clip_before = np.asarray(jax.device_get(state.clipping))
    s2, m = builder.d_step_dp(state, x, y, x, y, x, y, jax.random.PRNGKey(10))
    # clipping became data-dependent (per-layer stat * 1.5), not the initial 1s
    assert not np.allclose(np.asarray(s2.clipping), clip_before)
    assert np.all(np.asarray(s2.clipping) > 0)


def test_is_sensitivity_matches_finite_difference(tmp_path):
    """IS = ||d ||g(x)|| / dx||: check against central finite differences."""
    opt, builder, state = make(tmp_path, "MNIST", "-dpm", "is", bs=4)
    x, _ = batch(11, b=4, conditional=False)

    def grad_norm(x_in):
        def loss(d_params, xi):
            out, _ = builder._d_apply(d_params, xi, None)
            from csl_gan_tpu.models import losses
            return losses.d_real_loss("vanilla", out)
        g = jax.grad(loss)(state.d_params, x_in)
        from csl_gan_tpu.ops.grads import global_norm
        return global_norm(g)

    analytic = jax.grad(grad_norm)(x)
    # finite differences on a few random pixels
    rng = np.random.default_rng(0)
    for _ in range(3):
        i, h, w = rng.integers(0, 4), rng.integers(0, 28), rng.integers(0, 28)
        eps = 1e-3
        xp = x.at[i, h, w, 0].add(eps)
        xm = x.at[i, h, w, 0].add(-eps)
        fd = (float(grad_norm(xp)) - float(grad_norm(xm))) / (2 * eps)
        assert float(analytic[i, h, w, 0]) == pytest.approx(fd, rel=0.05, abs=1e-5)


def test_is_step_runs_per_param(tmp_path):
    opt, builder, state = make(tmp_path, "MNIST", "-dpm", "is", "-ispp", "true", bs=8)
    x, _ = batch(12, b=8, conditional=False)
    s2, m = builder.d_step_dp(state, x, None, x, None, jax.random.PRNGKey(13))
    sens = np.asarray(m["is_sens"])
    assert sens.shape == (len(leaves(state.d_params)),)
    assert np.all(np.isfinite(sens)) and np.all(sens >= 0)


def test_tm_sv_steps_run(tmp_path):
    for mode in ["tm", "sv"]:
        opt, builder, state = make(tmp_path, "MNIST", "-dpm", mode, bs=8)
        x, _ = batch(14, b=8, conditional=False)
        s2, m = builder.d_step_dp(state, x, None, x, None, jax.random.PRNGKey(15))
        for leaf in leaves(s2.d_params):
            assert np.all(np.isfinite(np.asarray(leaf)))


def test_chunked_gc_matches_unchunked(tmp_path):
    o1, b1, s1 = make(tmp_path, "MNIST", "-dpm", "gc", "--sigma", "0")
    o2, b2, s2 = make(tmp_path, "MNIST", "-dpm", "gc", "--sigma", "0",
                      "--per_sample_chunk", "4")
    x, _ = batch(16, conditional=False)
    rng = jax.random.PRNGKey(17)
    n1, m1 = b1.d_step_dp(s1, x, None, x, None, x, None, rng)
    n2, m2 = b2.d_step_dp(s2, x, None, x, None, x, None, rng)
    for a, b in zip(leaves(n1.d_params), leaves(n2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1["norm_mean"]),
                               np.asarray(m2["norm_mean"]), rtol=1e-4)


def test_wcgan_step(tmp_path):
    opt, builder, state = make(tmp_path, "MNIST", "--conditional",
                               "--conditional_arch", "WCGAN", bs=8)
    x, y = batch(18, b=8)
    s2, m = builder.d_step_plain(state, x, y, x, y, jax.random.PRNGKey(19))
    s3, gm = builder.g_step(s2, jax.random.PRNGKey(20))
    assert np.isfinite(float(m["d_adv_loss"]))
    assert np.isfinite(float(gm["g_adv_loss"]))


def test_per_sample_penalty_is_clipped(tmp_path):
    """Penalty on sensitive data (-pupd false) must be inside the clip bound:
    total summed grad norm <= B*C even with a large penalty term (the
    reference adds per-sample penalty grads before clipping too,
    train.py:438-450)."""
    from csl_gan_tpu.ops.grads import global_norm
    C = 0.05
    opt, builder, state = make(tmp_path, "MNIST", "-dpm", "gc", "--sigma", "0",
                               "-c", str(C), "--penalty", "WGAN-GP",
                               "-pupd", "false", bs=8)
    assert builder.penalty_types == ["WGAN-GP"]
    x, _ = batch(30, b=8, conditional=False)
    d_before = jax.device_get(state.d_params)
    s2, m = builder.d_step_dp(state, x, None, x, None, x, None,
                              jax.random.PRNGKey(31))
    # With sigma=0, Adam step ~ lr * normalized grad; instead verify via the
    # grad bound indirectly: rerun the internal pieces.
    _, b2, st2 = make(tmp_path, "MNIST", "-dpm", "gc", "--sigma", "0",
                      "-c", str(C), "--penalty", "WGAN-GP", "-pupd", "false", bs=8)
    import jax.numpy as jnp
    from csl_gan_tpu.ops import grads as gops
    k_z, k_noise, k_pen = jax.random.split(jax.random.PRNGKey(31), 3)
    z = b2.gen_z(k_z, 8)
    fake_img, _ = b2._fake_images(st2, z, None)
    pen_keys = jax.random.split(k_pen, 8)
    f, args = b2._real_ps_args(x, None, None, fake_img, pen_keys)
    summed, stats = gops.clipped_grad_sum(f, st2.d_params, *args, max_norm=C)
    assert float(global_norm(summed)) <= 8 * C + 1e-5
    # and the penalty is actually present: unclipped norms exceed the
    # penalty-free ones
    f0, args0 = b2._real_ps_args(x, None, None)
    _, stats0 = gops.clipped_grad_sum(f0, st2.d_params, *args0, max_norm=1e9)
    _, stats_pen = gops.clipped_grad_sum(f, st2.d_params, *args, max_norm=1e9)
    assert float(stats_pen.norm_mean.sum()) != float(stats0.norm_mean.sum())
