"""--bf16 mixed precision tests.

bf16 is a compute-dtype change only (params fp32): model outputs and the
conv-ghost DP pass must track the fp32 results within bf16 tolerance, and —
critically for DP — every per-sample contribution of the bf16 clipped sum
must still respect the clip bound (the norm margin in ops/conv_ghost.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csl_gan_tpu import options
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.ops import conv_ghost
from csl_gan_tpu.training.steps import TrainStepBuilder


def setup(tmp_path, *argv, bs=16):
    opt = options.parse(["MNIST", "--model", "DeepConvResNet", *argv,
                         "-o", str(tmp_path / "o"), "-bs", str(bs),
                         "--manual_seed", "17"])
    (G, Gv), (D, Dv) = init_models(opt)
    b = TrainStepBuilder(opt, G, D)
    return opt, b, b.init_state(Gv, Dv)


def batch(bs=16):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    return (jax.random.uniform(kx, (bs, 28, 28, 1), minval=-1, maxval=1),
            jax.random.randint(ky, (bs,), 0, 10))


def test_bf16_model_outputs_track_fp32(tmp_path):
    _, b32, s32 = setup(tmp_path, "--conditional", "-dpm", "gc")
    _, b16, s16 = setup(tmp_path, "--conditional", "-dpm", "gc",
                        "--bf16", "true")
    x, y = batch()
    o32, a32 = b32._d_apply(s32.d_params, x, y)
    o16, a16 = b16._d_apply(s16.d_params, x, y)
    assert o16.dtype == jnp.float32   # heads return fp32
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o32),
                               rtol=0.1, atol=0.05)
    z = b32.gen_z(jax.random.PRNGKey(1), 4)
    img32 = b32.G.apply({"params": s32.g_params}, z, y[:4], train=True)
    img16 = b16.G.apply({"params": s16.g_params}, z, y[:4], train=True)
    assert img16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(img16), np.asarray(img32),
                               rtol=0.2, atol=0.05)


def test_bf16_ghost_tracks_fp32_and_respects_bound(tmp_path):
    opt, b, state = setup(tmp_path, "--conditional", "-dpm", "gc",
                          "--bf16", "true")
    assert b.use_conv_ghost and b.compute_dtype == jnp.bfloat16
    x, y = batch()
    kw = dict(n_classes=10, arch="ACGAN", aux_type=b.aux_type,
              aux_scalar=1.0, row_w=None, concat_planes=False,
              max_norm=0.5, per_layer=False)
    got16, stats16, _ = conv_ghost.dcresnet_real_ghost(
        state.d_params, x, y, compute_dtype=jnp.bfloat16, **kw)
    got32, stats32, _ = conv_ghost.dcresnet_real_ghost(
        state.d_params, x, y, compute_dtype=None, **kw)
    for a, g in zip(jax.tree_util.tree_leaves(got32),
                    jax.tree_util.tree_leaves(got16)):
        assert g.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(stats16.norm_mean),
                               np.asarray(stats32.norm_mean), rtol=0.03)


def test_bf16_clip_bound_holds_per_sample(tmp_path):
    """The DP guarantee: each sample's clipped contribution has norm <= C
    even under bf16 compute (checked by running the bf16 ghost pass on
    single-sample batches, where the summed grad IS the contribution)."""
    opt, b, state = setup(tmp_path, "--conditional", "-dpm", "gc",
                          "--bf16", "true", bs=4)
    x, y = batch(4)
    C = 0.05  # tight: everything clips
    for i in range(4):
        summed, _, _ = conv_ghost.dcresnet_real_ghost(
            state.d_params, x[i:i + 1], y[i:i + 1],
            n_classes=10, arch="ACGAN", aux_type=b.aux_type, aux_scalar=1.0,
            row_w=None, concat_planes=False, max_norm=C, per_layer=False,
            compute_dtype=jnp.bfloat16)
        total = float(jnp.sqrt(sum(
            jnp.sum(g.astype(jnp.float32) ** 2)
            for g in jax.tree_util.tree_leaves(summed))))
        assert total <= C * (1 + 1e-5), total


def test_bf16_full_step_and_g_step_run(tmp_path):
    opt, b, state = setup(tmp_path, "--conditional", "-dpm", "gc",
                          "--bf16", "true")
    x, y = batch()
    rng = jax.random.PRNGKey(4)
    s2, m = b.d_step_dp(state, x, y, x, y, x, y, rng)
    assert np.isfinite(float(m["d_adv_loss"]))
    s3, gm = b.g_step(s2, rng)
    assert np.isfinite(float(gm["g_adv_loss"]))
    for g in jax.tree_util.tree_leaves(s3.g_params):
        assert g.dtype == jnp.float32   # params stay fp32
        assert np.isfinite(np.asarray(g)).all()
