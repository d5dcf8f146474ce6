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
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


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
