"""Multi-device sharding tests on the 8-device virtual CPU mesh:
the DP train step over a sharded batch must match single-device results
(the mesh is the framework's replacement for the reference's two-GPU
model-parallel split, SURVEY.md §5.8)."""

import jax
import jax.numpy as jnp
import numpy as np

from csl_gan_tpu import options
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.parallel import make_mesh
from csl_gan_tpu.training.steps import TrainStepBuilder


def setup(tmp_path, *argv, bs=32):
    opt = options.parse(["MNIST", *argv, "-o", str(tmp_path / "o"),
                         "-bs", str(bs), "--manual_seed", "21"])
    (G, Gv), (D, Dv) = init_models(opt)
    builder = TrainStepBuilder(opt, G, D)
    state = builder.init_state(Gv, Dv)
    return opt, builder, state


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_gc_step_sharded_matches_single(tmp_path):
    opt, builder, state = setup(tmp_path, "-dpm", "gc", "--conditional",
                                "--sigma", "0")
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(kx, (32, 28, 28, 1))
    y = jax.random.randint(ky, (32,), 0, 10)
    rng = jax.random.PRNGKey(1)

    # Single-device result.
    _, b1, s1 = setup(tmp_path, "-dpm", "gc", "--conditional", "--sigma", "0")
    out1, m1 = b1.d_step_dp(s1, x, y, x, y, x, y, rng)
    ref = jax.device_get(out1.d_params)

    # Sharded over the 8-device mesh.
    ctx = make_mesh(n=8)
    state = ctx.put_replicated(state)
    xs, ys = ctx.put_batch(x, y)
    out8, m8 = builder.d_step_dp(state, xs, ys, xs, ys, xs, ys, rng)
    got = jax.device_get(out8.d_params)

    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


def test_conv_gc_step_sharded_matches_single(tmp_path):
    """The conv-ghost DP step (DCResNet family) over the sharded batch must
    match single-device results — multi-chip coverage for the conv models
    (the 64px CelebA presets differ only in channel counts)."""
    args = ("-dpm", "gc", "--conditional", "--sigma", "0",
            "--model", "DeepConvResNet")
    opt, builder, state = setup(tmp_path, *args, bs=16)
    assert builder.use_conv_ghost
    kx, ky = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.uniform(kx, (16, 28, 28, 1))
    y = jax.random.randint(ky, (16,), 0, 10)
    rng = jax.random.PRNGKey(6)

    _, b1, s1 = setup(tmp_path, *args, bs=16)
    out1, _ = b1.d_step_dp(s1, x, y, x, y, x, y, rng)
    ref = jax.device_get(out1.d_params)

    ctx = make_mesh(n=8)
    state = ctx.put_replicated(state)
    xs, ys = ctx.put_batch(x, y)
    out8, _ = builder.d_step_dp(state, xs, ys, xs, ys, xs, ys, rng)
    got = jax.device_get(out8.d_params)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        # atol covers 8-way-psum reduction-order drift (the G's phase-form
        # upsample-conv pre-sums kernel taps, shifting rounding slightly).
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-5)


def test_g_step_sharded_runs(tmp_path):
    opt, builder, state = setup(tmp_path, "--conditional")
    ctx = make_mesh(n=8)
    state = ctx.put_replicated(state)
    out, m = builder.g_step(state, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["g_adv_loss"]))


def test_batch_actually_sharded():
    ctx = make_mesh(n=8)
    x = jnp.ones((32, 4))
    xs = ctx.put_batch(x)
    assert len(xs.sharding.device_set) == 8


# ---------------- --fsdp: ZeRO-3-style state sharding ----------------

def _fsdp_setup(tmp_path, *argv, bs=32):
    opt, builder, state = setup(tmp_path, *argv, bs=bs)
    ctx = make_mesh(n=8, fsdp=True)
    builder._constrain_state = ctx.constrain_state
    return ctx, builder, ctx.put_state(state)


def test_fsdp_spec_picks_divisible_axis():
    from csl_gan_tpu.parallel.mesh import fsdp_spec
    from jax.sharding import PartitionSpec as P
    assert fsdp_spec((794, 128), 8) == P(None, "data")   # 794 % 8 != 0
    assert fsdp_spec((5, 5, 512, 256), 8) == P(None, None, "data", None)
    assert fsdp_spec((128,), 8) == P()                   # under size floor
    assert fsdp_spec((), 8) == P()
    assert fsdp_spec((4093, 3), 8) == P()                # nothing divisible


def test_fsdp_state_actually_sharded(tmp_path):
    ctx, builder, state = _fsdp_setup(tmp_path, "-dpm", "gc", "--conditional")
    sharded = [l for l in jax.tree_util.tree_leaves(state.d_params)
               if len(l.sharding.device_set) == 8
               and l.addressable_shards[0].data.size < l.size]
    assert sharded, "no D param leaf is actually sharded under --fsdp"
    # Adam moments follow the params' shardings (same shapes).
    mu_sharded = [l for l in jax.tree_util.tree_leaves(state.d_opt_state)
                  if hasattr(l, "sharding")
                  and l.addressable_shards[0].data.size < l.size]
    assert mu_sharded


def test_fsdp_gc_step_matches_replicated(tmp_path):
    args = ("-dpm", "gc", "--conditional", "--sigma", "0")
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(kx, (32, 28, 28, 1))
    y = jax.random.randint(ky, (32,), 0, 10)
    rng = jax.random.PRNGKey(1)

    _, b1, s1 = setup(tmp_path, *args)
    out1, _ = b1.d_step_dp(s1, x, y, x, y, x, y, rng)
    out1, _ = b1.g_step(out1, rng)
    ref = jax.device_get((out1.d_params, out1.g_params))

    ctx, b2, s2 = _fsdp_setup(tmp_path, *args)
    xs, ys = ctx.put_batch(x, y)
    out2, _ = b2.d_step_dp(s2, xs, ys, xs, ys, xs, ys, rng)
    out2, _ = b2.g_step(out2, rng)
    # Output state stays FSDP-sharded across steps (the constraint held).
    still = [l for l in jax.tree_util.tree_leaves(out2.d_params)
             if l.addressable_shards[0].data.size < l.size]
    assert still, "step output lost its FSDP sharding"
    got = jax.device_get((out2.d_params, out2.g_params))
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


def test_fsdp_segment_runner_matches(tmp_path):
    """The interval scan with FSDP state + sharded batch == plain run."""
    args = ("--conditional", "-dpm", "gc", "--sigma", "0")
    opt, b1, s1 = setup(tmp_path, *args, bs=16)
    kx, ky = jax.random.split(jax.random.PRNGKey(2))
    images = jax.random.uniform(kx, (64, 28, 28, 1))
    labels = jax.random.randint(ky, (64,), 0, 10)
    perm = jnp.arange(64)
    g_mask = jnp.asarray([True, False, True])
    rng = jax.random.PRNGKey(11)

    r1 = b1.build_segment_runner(use_dp=True)
    ref, *_ = r1(s1, rng, images, labels, perm, 0, g_mask,
                 jnp.zeros(()), jnp.zeros(()))

    ctx, b2, s2 = _fsdp_setup(tmp_path, *args, bs=16)
    r2 = b2.build_segment_runner(use_dp=True, batch_sharding=ctx.batch)
    got, *_ = r2(s2, rng, ctx.put_replicated(images),
                 ctx.put_replicated(labels), ctx.put_replicated(perm),
                 0, g_mask, jnp.zeros(()), jnp.zeros(()))
    for a, b in zip(jax.tree_util.tree_leaves(ref.d_params),
                    jax.tree_util.tree_leaves(got.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_fsdp_flag_roundtrip(tmp_path):
    from csl_gan_tpu import options
    opt = options.parse(["MNIST", "--fsdp", "true", "-o", str(tmp_path / "o")])
    assert make_mesh(opt, n=8).fsdp
    opt2 = options.parse(["MNIST", "-o", str(tmp_path / "p")])
    assert not make_mesh(opt2, n=8).fsdp


def test_fsdp_conv_ghost_step_matches(tmp_path):
    """FSDP with the DCResNet D: the conv kernels are the leaves that
    really shard; the conv-ghost DP step must still match replicated."""
    args = ("-dpm", "gc", "--conditional", "--sigma", "0",
            "--model", "DeepConvResNet")
    kx, ky = jax.random.split(jax.random.PRNGKey(9))
    x = jax.random.uniform(kx, (16, 28, 28, 1))
    y = jax.random.randint(ky, (16,), 0, 10)
    rng = jax.random.PRNGKey(10)

    _, b1, s1 = setup(tmp_path, *args, bs=16)
    assert b1.use_conv_ghost
    out1, _ = b1.d_step_dp(s1, x, y, x, y, x, y, rng)
    ref = jax.device_get(out1.d_params)

    ctx, b2, s2 = _fsdp_setup(tmp_path, *args, bs=16)
    xs, ys = ctx.put_batch(x, y)
    out2, _ = b2.d_step_dp(s2, xs, ys, xs, ys, xs, ys, rng)
    n_shard = sum(1 for l in jax.tree_util.tree_leaves(out2.d_params)
                  if l.addressable_shards[0].data.size < l.size)
    assert n_shard >= 3, f"expected conv kernels sharded, got {n_shard}"
    got = jax.device_get(out2.d_params)
    # atol covers 8-way-psum reduction-order drift on the conv-ghost
    # weighted sums (observed max ~1.5e-5 on the aux kernel).
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


# ---------------- --tp: tensor-parallel (model-axis) sharding ----------------

def _tp_setup(tmp_path, *argv, bs=32, tp=2, fsdp=False):
    opt, builder, state = setup(tmp_path, *argv, bs=bs)
    ctx = make_mesh(n=8, tp=tp, fsdp=fsdp)
    builder._constrain_state = ctx.constrain_state
    return ctx, builder, ctx.put_state(state)


def test_state_spec_tp_and_fsdp_compose():
    from csl_gan_tpu.parallel.mesh import state_spec
    from jax.sharding import PartitionSpec as P
    # tp shards the output-channel (last) dim; fsdp takes a different dim.
    assert state_spec((5, 5, 64, 128), 4, 2, False) == \
        P(None, None, None, "model")
    assert state_spec((5, 5, 64, 128), 4, 2, True) == \
        P(None, None, "data", "model")
    # Last dim not tp-divisible: no model sharding, fsdp still applies.
    assert state_spec((794, 129), 4, 2, True) == P()
    assert state_spec((792, 129), 4, 2, True) == P("data", None)
    # Under the size floor: replicated regardless.
    assert state_spec((128,), 4, 2, True) == P()


def test_tp_must_divide_mesh():
    import pytest
    with pytest.raises(ValueError):
        make_mesh(n=8, tp=3)


def test_tp_state_actually_sharded(tmp_path):
    ctx, builder, state = _tp_setup(tmp_path, "-dpm", "gc", "--conditional")
    assert ctx.mesh.axis_names == ("data", "model") and ctx.dp == 4
    sharded = [l for l in jax.tree_util.tree_leaves(state.d_params)
               if l.addressable_shards[0].data.size < l.size]
    assert sharded, "no D param leaf is actually sharded under --tp"
    mu_sharded = [l for l in jax.tree_util.tree_leaves(state.d_opt_state)
                  if hasattr(l, "sharding")
                  and l.addressable_shards[0].data.size < l.size]
    assert mu_sharded


def test_tp_gc_step_matches_replicated(tmp_path):
    args = ("-dpm", "gc", "--conditional", "--sigma", "0")
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(kx, (32, 28, 28, 1))
    y = jax.random.randint(ky, (32,), 0, 10)
    rng = jax.random.PRNGKey(1)

    _, b1, s1 = setup(tmp_path, *args)
    out1, _ = b1.d_step_dp(s1, x, y, x, y, x, y, rng)
    out1, _ = b1.g_step(out1, rng)
    ref = jax.device_get((out1.d_params, out1.g_params))

    ctx, b2, s2 = _tp_setup(tmp_path, *args)
    xs, ys = ctx.put_batch(x, y)
    out2, _ = b2.d_step_dp(s2, xs, ys, xs, ys, xs, ys, rng)
    out2, _ = b2.g_step(out2, rng)
    still = [l for l in jax.tree_util.tree_leaves(out2.d_params)
             if l.addressable_shards[0].data.size < l.size]
    assert still, "step output lost its tp sharding"
    got = jax.device_get((out2.d_params, out2.g_params))
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


def test_tp_conv_ghost_step_matches(tmp_path):
    """dp4 x tp2 with the DCResNet D: conv kernels channel-shard over the
    model axis while the batch shards over data; the conv-ghost DP step
    must still match the single-device result."""
    args = ("-dpm", "gc", "--conditional", "--sigma", "0",
            "--model", "DeepConvResNet")
    kx, ky = jax.random.split(jax.random.PRNGKey(9))
    x = jax.random.uniform(kx, (16, 28, 28, 1))
    y = jax.random.randint(ky, (16,), 0, 10)
    rng = jax.random.PRNGKey(10)

    _, b1, s1 = setup(tmp_path, *args, bs=16)
    assert b1.use_conv_ghost
    out1, _ = b1.d_step_dp(s1, x, y, x, y, x, y, rng)
    ref = jax.device_get(out1.d_params)

    ctx, b2, s2 = _tp_setup(tmp_path, *args, bs=16)
    xs, ys = ctx.put_batch(x, y)
    out2, _ = b2.d_step_dp(s2, xs, ys, xs, ys, xs, ys, rng)
    # The MNIST DCResNet D has exactly 2 tp-shardable leaves: the conv2
    # kernel [5,5,64,128] and linOutAux [6272,10] (linOut's last dim is 1).
    n_shard = sum(1 for l in jax.tree_util.tree_leaves(out2.d_params)
                  if l.addressable_shards[0].data.size < l.size)
    assert n_shard >= 2, f"expected conv kernels tp-sharded, got {n_shard}"
    got = jax.device_get(out2.d_params)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


def test_tp_fsdp_composed_step_matches(tmp_path):
    """--tp 2 + --fsdp on one 2-D mesh: kernels shard [.., data, model]."""
    args = ("-dpm", "gc", "--conditional", "--sigma", "0")
    kx, ky = jax.random.split(jax.random.PRNGKey(12))
    x = jax.random.uniform(kx, (32, 28, 28, 1))
    y = jax.random.randint(ky, (32,), 0, 10)
    rng = jax.random.PRNGKey(13)

    _, b1, s1 = setup(tmp_path, *args)
    out1, _ = b1.d_step_dp(s1, x, y, x, y, x, y, rng)
    ref = jax.device_get(out1.d_params)

    ctx, b2, s2 = _tp_setup(tmp_path, *args, fsdp=True)
    assert ctx.fsdp and ctx.tp == 2
    # The vanilla D's only big leaf (794, 128) is 4-indivisible on dim 0,
    # so the data+model two-axis split shows up in the G's square layers.
    two_axis = [l for l in jax.tree_util.tree_leaves(
                    (s2.d_params, s2.g_params))
                if l.size // l.addressable_shards[0].data.size >= 8]
    assert two_axis, "no leaf sharded over both data and model axes"
    xs, ys = ctx.put_batch(x, y)
    out2, _ = b2.d_step_dp(s2, xs, ys, xs, ys, xs, ys, rng)
    got = jax.device_get(out2.d_params)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


def test_tp_flag_roundtrip(tmp_path):
    opt = options.parse(["MNIST", "--tp", "2", "-o", str(tmp_path / "o")])
    ctx = make_mesh(opt, n=8)
    assert ctx.tp == 2 and ctx.dp == 4
    opt2 = options.parse(["MNIST", "-o", str(tmp_path / "p")])
    assert make_mesh(opt2, n=8).tp == 1


def test_dcresnet_segment_scan_sharded_phase_carry(tmp_path):
    """The DCResNet segment scan with the phase-collapse cache riding the
    carry (--phase_carry) — and its cadence-grouped variant
    (--group_fakes) — must run over the 8-device mesh with a sharded
    batch and match the single-device trajectory. (Round-4 verdict gap:
    the sharded-scan tests covered MNIST vanilla only; the dryrun used
    MNIST too.)"""
    args = ("--conditional", "-dpm", "gc", "--sigma", "0",
            "--model", "DeepConvResNet", "--n_d_steps", "2",
            "--train_d_until_threshold", "1e18", "--group_fakes", "true")
    kx, ky = jax.random.split(jax.random.PRNGKey(2))
    images = jax.random.uniform(kx, (32, 28, 28, 1))
    labels = jax.random.randint(ky, (32,), 0, 10)
    perm = jnp.arange(32)
    g_mask = jnp.asarray([True, False])
    rng = jax.random.PRNGKey(11)

    opt, b1, s1 = setup(tmp_path, *args, bs=16)
    assert b1.use_phase_carry and b1.grouped_runner_ok(True)
    r1 = b1.build_segment_runner(use_dp=True)
    ref, _, dref, _, cref, _ = r1(s1, rng, images, labels, perm, 0, g_mask,
                                  jnp.zeros(()), jnp.zeros(()))

    ctx = make_mesh(n=8)
    _, b2, s2 = setup(tmp_path, *args, bs=16)
    r2 = b2.build_segment_runner(use_dp=True, batch_sharding=ctx.batch,
                                 grouped=True)
    got, _, dgot, _, cgot, _ = r2(
        ctx.put_replicated(s2), rng, ctx.put_replicated(images),
        ctx.put_replicated(labels), ctx.put_replicated(perm), 0,
        g_mask, jnp.zeros(()), jnp.zeros(()))
    assert int(cgot) == int(cref) == 1
    for a, b in zip(jax.tree_util.tree_leaves(ref.d_params),
                    jax.tree_util.tree_leaves(got.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref.g_params),
                    jax.tree_util.tree_leaves(got.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
