"""Exact Poisson subsampling (--poisson) tests.

A correctness capability the reference never had: fixed-size shuffled
batches while the RDP accountant assumes Poisson sampling (SURVEY.md §2.1).
With --poisson, each step draws Bernoulli(B/N) over the dataset into a
static-shape buffer + validity mask; masked rows must contribute exactly
zero, and an all-valid draw of exactly B rows must reproduce the fixed-batch
step bit-for-math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csl_gan_tpu import options
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.ops import grads as gops
from csl_gan_tpu.training.steps import TrainStepBuilder


def setup(tmp_path, *argv, bs=16):
    opt = options.parse(["MNIST", *argv, "-o", str(tmp_path / "o"),
                         "-bs", str(bs), "--manual_seed", "17"])
    (G, Gv), (D, Dv) = init_models(opt)
    b = TrainStepBuilder(opt, G, D)
    return opt, b, b.init_state(Gv, Dv)


def batch(bs=16, seed=0):
    kx, ky = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.uniform(kx, (bs, 28, 28, 1)),
            jax.random.randint(ky, (bs,), 0, 10))


def test_poisson_requires_gc(tmp_path):
    with pytest.raises(Exception, match="poisson"):
        options.parse(["MNIST", "--poisson", "true", "-dpm", "is",
                       "-o", str(tmp_path / "x")])


def test_masked_step_equals_fixed_batch_step(tmp_path):
    """All-valid Poisson draw of exactly B rows == the fixed-batch step."""
    bs = 16
    _, bp, sp = setup(tmp_path, "-dpm", "gc", "--conditional", "--sigma", "0",
                      "--poisson", "true", bs=bs)
    _, bf, sf = setup(tmp_path, "-dpm", "gc", "--conditional", "--sigma", "0",
                      bs=bs)
    # force the generic path on BOTH sides for exact comparison (the ghost
    # fast paths are pinned to the generic one in test_ghost/test_conv_ghost
    # and below)
    bp.use_ghost = bf.use_ghost = False
    assert bp.poisson
    x, y = batch(bs)
    rng = jax.random.PRNGKey(4)
    valid = jnp.ones((bs,))
    np_state, _ = bp._d_step_gc(sp, x, y, x, y, x, y, rng, valid)
    nf_state, _ = bf._d_step_gc(sf, x, y, x, y, x, y, rng)
    for a, g in zip(jax.tree_util.tree_leaves(np_state.d_params),
                    jax.tree_util.tree_leaves(nf_state.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g),
                                   rtol=1e-5, atol=1e-7)


def test_masked_rows_have_zero_influence(tmp_path):
    """Two buffers identical on the valid rows but with different junk in the
    masked rows step to identical parameters and metrics."""
    bs = 16
    opt, b, state = setup(tmp_path, "-dpm", "gc", "--conditional",
                          "--sigma", "0", "--poisson", "true", bs=bs)
    cap = bs + 8
    x, y = batch(cap)
    valid = jnp.asarray([1.0] * bs + [0.0] * (cap - bs))
    x2 = x.at[bs:].set(123.0)   # junk masked rows
    y2 = y.at[bs:].set(0)
    rng = jax.random.PRNGKey(9)
    s1, m1 = b._d_step_gc(state, x, y, x, y, x, y, rng, valid)
    _, b2, state2 = setup(tmp_path, "-dpm", "gc", "--conditional",
                          "--sigma", "0", "--poisson", "true", bs=bs)
    s2, m2 = b2._d_step_gc(state2, x2, y2, x2, y2, x2, y2, rng, valid)
    for a, g in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(s2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g),
                                   rtol=1e-5, atol=1e-7)
    for k in ("d_real_loss", "d_real_acc", "d_real_aux_acc"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5)


def test_masked_clipped_sum_equals_subset_sum(tmp_path):
    """clipped_grad_sum with a validity-masked loss == clipped_grad_sum over
    the valid subset alone."""
    bs, cap = 12, 20
    opt, b, state = setup(tmp_path, "-dpm", "gc", "--conditional",
                          "--poisson", "true", bs=bs)
    x, y = batch(cap, seed=3)
    valid = jnp.asarray([1.0] * bs + [0.0] * (cap - bs))
    f, args = b._real_ps_args(x, y, None)
    fm, argsm = b._mask_loss(f, args, valid)
    got, _ = gops.clipped_grad_sum(fm, state.d_params, *argsm, max_norm=0.05)
    fs, argss = b._real_ps_args(x[:bs], y[:bs], None)
    want, _ = gops.clipped_grad_sum(fs, state.d_params, *argss, max_norm=0.05)
    for a, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_ghost_paths_respect_mask(tmp_path):
    """Both ghost fast paths honor the Poisson mask exactly (== the generic
    masked clipped sum), so --poisson keeps the fast clipping."""
    from csl_gan_tpu.ops import conv_ghost, ghost
    bs, cap = 12, 16
    valid = jnp.asarray([1.0] * bs + [0.0] * (cap - bs))
    x, y = batch(cap, seed=5)

    # vanilla D
    opt, b, state = setup(tmp_path, "-dpm", "gc", "--conditional",
                          "--poisson", "true", bs=bs)
    assert b.use_ghost
    f, args = b._real_ps_args(x, y, None)
    fm, argsm = b._mask_loss(f, args, valid)
    want, _ = gops.clipped_grad_sum(fm, state.d_params, *argsm, max_norm=0.05)
    got, _, _ = ghost.vanilla_real_ghost(
        state.d_params, x, jax.nn.one_hot(y, 10), y, b.aux_scalar, 0.05,
        False, valid=valid)
    for a, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=5e-4, atol=1e-6)

    # conv D
    opt2 = options.parse(["MNIST", "--model", "DeepConvResNet", "-dpm", "gc",
                          "--conditional", "--poisson", "true",
                          "-o", str(tmp_path / "o2"), "-bs", str(bs),
                          "--manual_seed", "17"])
    (G2, Gv2), (D2, Dv2) = init_models(opt2)
    b2 = TrainStepBuilder(opt2, G2, D2)
    s2 = b2.init_state(Gv2, Dv2)
    assert b2.use_conv_ghost
    row_w = b2._row_weights(y, valid)
    f, args = b2._real_ps_args(x, y, row_w)
    fm, argsm = b2._mask_loss(f, args, valid)
    want, _ = gops.clipped_grad_sum(fm, s2.d_params, *argsm, max_norm=0.05)
    got, _, _ = conv_ghost.dcresnet_real_ghost(
        s2.d_params, x, y, n_classes=10, arch="ACGAN",
        aux_type=b2.aux_type, aux_scalar=1.0, row_w=row_w,
        concat_planes=False, max_norm=0.05, per_layer=False, valid=valid)
    for a, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-3, atol=2e-5)


def test_adaptive_norms_only_matches_generic(tmp_path):
    """Adaptive clipping's conv-ghost norms == materialized per-sample grad
    norms."""
    opt = options.parse(["MNIST", "--model", "DeepConvResNet", "-dpm", "gc",
                         "--conditional", "-gcm", "adaptive",
                         "-nms", "1", "--mean_sample_size", "4",
                         "-o", str(tmp_path / "o3"), "-bs", "8",
                         "--manual_seed", "17"])
    (G, Gv), (D, Dv) = init_models(opt)
    b = TrainStepBuilder(opt, G, D)
    state = b.init_state(Gv, Dv)
    assert b.adaptive and b.use_conv_ghost
    x, y = batch(8, seed=7)
    got = b._adaptive_clipping(state.d_params, x, y)
    b.use_conv_ghost = False
    want = b._adaptive_clipping(state.d_params, x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-6)


def test_poisson_cap_clamped_to_dataset(tmp_path):
    """High sampling rates (cap would exceed N) must not crash: cap clamps
    to train_set_size and the draw stays shape-consistent."""
    opt, b, state = setup(tmp_path, "-dpm", "gc", "--poisson", "true",
                          "-tss", "100", bs=90)
    assert b.poisson_cap == 100
    images = jnp.zeros((100, 28, 28, 1))
    labels = jnp.zeros((100,), jnp.int32)
    x, y, valid = b.poisson_draw(images, labels, jax.random.PRNGKey(0))
    assert x.shape[0] == valid.shape[0] == 100
    assert 0 < float(jnp.sum(valid)) <= 100


def test_adaptive_requires_public_or_mean_data(tmp_path):
    """Reference parity made explicit: adaptive thresholds come from
    public/mean data (reference train.py:204-216 crashes with neither)."""
    with pytest.raises(Exception, match="[Aa]daptive"):
        options.parse(["MNIST", "-dpm", "gc", "-gcm", "adaptive",
                       "-o", str(tmp_path / "x")])


def test_poisson_train_cli_scan_and_host(tmp_path):
    """End-to-end --poisson training via train.py on both loop modes."""
    import csv
    import train as train_cli
    for mode, flag in [("scan", "false"), ("host", "true")]:
        out = str(tmp_path / mode)
        train_cli.main(["MNIST", "-tss", "200", "-ne", "2", "-bs", "50",
                        "--manual_seed", "5", "-dpm", "gc", "--poisson", "true",
                        "--log_every", "200", "--sample_every", "100000",
                        "--save_every", "2", "--host_loop", flag, "-o", out])
        with open(out + "/privacy_log.csv") as f:
            rows = [r for r in csv.reader(f) if r and r[0] != "Epoch"]
        assert len(rows) == 2
        assert np.isfinite(float(rows[-1][1]))
        with open(out + "/log.csv") as f:
            lrows = [r for r in csv.reader(f) if r and r[0] != "Epoch"]
        # Scalar columns are floats; per-layer grad-norm columns are
        # bracketed vectors — parse both (np.array raises on malformed
        # cells, unlike the deprecated np.fromstring which returns empty).
        for v in lrows[-1][2:]:
            vals = np.array(v.strip().strip("[]").split(), dtype=float) \
                if v.strip().startswith("[") else np.array([float(v)])
            assert vals.size and np.all(np.isfinite(vals))
