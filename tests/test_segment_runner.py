"""Device-side interval scan (build_segment_runner) correctness tests."""

import jax
import jax.numpy as jnp
import numpy as np

from csl_gan_tpu import options
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.training.steps import TrainStepBuilder


def setup(tmp_path, *argv, bs=20):
    opt = options.parse(["MNIST", *argv, "-o", str(tmp_path / "o"),
                         "-bs", str(bs), "--manual_seed", "31"])
    (G, Gv), (D, Dv) = init_models(opt)
    builder = TrainStepBuilder(opt, G, D)
    return opt, builder, builder.init_state(Gv, Dv)


def make_data(n=100, bs=20):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    return (jax.random.uniform(kx, (n, 28, 28, 1)),
            jax.random.randint(ky, (n,), 0, 10))


def step_key_row(rng, i, start=0, epoch=0):
    """The runner's positional per-step subkey row (segment_runner.py):
    subkey (i, j) = fold_in(fold_in(rng, epoch), (start + i) * 8 + j)."""
    base = jax.random.fold_in(rng, epoch)
    return jnp.stack([jax.random.fold_in(base, (start + i) * 8 + j)
                      for j in range(8)])


def manual_sequence(builder, state, rng, images, labels, perm, g_mask, use_dp,
                    conditional):
    """Replicates the scan body on the host, step by step."""
    bs = builder.opt.batch_size
    for i in range(len(g_mask)):
        kk = step_key_row(rng, i)
        idx = perm[i * bs:(i + 1) * bs]
        x = images[idx]
        y = labels[idx] if conditional else None
        state, _ = builder._d_core(state, x, y, x, y, x, y, kk[0:3], use_dp)
        if bool(g_mask[i]):
            state, _ = builder._g_step(state, kk[3:5])
    return state


def test_scan_matches_sequential_plain(tmp_path):
    opt, builder, state = setup(tmp_path, "--conditional")
    images, labels = make_data()
    perm = jnp.arange(100)
    g_mask = jnp.asarray([True, False, True, False, True])
    rng = jax.random.PRNGKey(7)

    runner = builder.build_segment_runner(use_dp=False)
    s_scan, _, d_sums, g_sums, g_count, _ = runner(
        state, rng, images, labels, perm, 0, g_mask, jnp.zeros(()), jnp.zeros(()))
    assert int(g_count) == 3

    _, builder2, state2 = setup(tmp_path, "--conditional")
    s_seq = manual_sequence(builder2, state2, rng, images, labels, perm,
                            np.asarray(g_mask), False, True)
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.d_params),
                    jax.tree_util.tree_leaves(s_seq.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.g_params),
                    jax.tree_util.tree_leaves(s_seq.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_scan_matches_sequential_gc(tmp_path):
    opt, builder, state = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0")
    images, labels = make_data()
    perm = jnp.arange(100)
    g_mask = jnp.asarray([True, True, True])
    rng = jax.random.PRNGKey(9)

    runner = builder.build_segment_runner(use_dp=True)
    s_scan, *_ = runner(state, rng, images, labels, perm, 0, g_mask, jnp.zeros(()), jnp.zeros(()))

    _, builder2, state2 = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0")
    s_seq = manual_sequence(builder2, state2, rng, images, labels, perm,
                            np.asarray(g_mask), True, True)
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.d_params),
                    jax.tree_util.tree_leaves(s_seq.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_scan_start_offset(tmp_path):
    """start=k must process batches [k, k+len) of the permutation."""
    opt, builder, state = setup(tmp_path)
    images, labels = make_data()
    perm = jnp.arange(100)
    rng = jax.random.PRNGKey(3)
    runner = builder.build_segment_runner(use_dp=False)
    g1 = jnp.asarray([False])
    # run segment [2,3) from offset 2 vs manual on batch 2
    s_scan, *_ = runner(state, rng, images, labels, perm, 2, g1, jnp.zeros(()), jnp.zeros(()))
    _, builder2, state2 = setup(tmp_path)
    kk = step_key_row(rng, 0, start=2)
    x = images[40:60]
    s_seq, _ = builder2._d_core(state2, x, None, x, None, x, None, kk[0:3],
                                False)
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.d_params),
                    jax.tree_util.tree_leaves(s_seq.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_scan_threshold_gating_matches_host(tmp_path):
    """train_d_until_threshold inside the scan must reproduce the host
    per-batch gating (reference train.py:521-533): G trains only when the
    n_d_steps-average D adv loss is below the threshold, and the
    accumulator resets at every cadence point."""
    n_d = 2
    # Early MNIST D adv loss is ~2*ln2 ~= 1.386/batch. At cadence point 0 the
    # accumulator holds ONE batch (host quirk kept), so avg ~= 0.69 < 0.8
    # trains G; later points average two batches (~1.39 > 0.8) and skip.
    thresh = 0.8
    args = ["--conditional", "--n_d_steps", str(n_d),
            "--train_d_until_threshold", str(thresh)]
    opt, builder, state = setup(tmp_path, *args)
    images, labels = make_data()
    perm = jnp.arange(100)
    g_mask = jnp.asarray([i % n_d == 0 for i in range(5)])
    rng = jax.random.PRNGKey(13)

    runner = builder.build_segment_runner(use_dp=False)
    s_scan, _, _, _, g_count, acc_out = runner(
        state, rng, images, labels, perm, 0, g_mask, jnp.zeros(()),
        jnp.zeros(()))

    # Host replica of train_batch's gating (loop.py train_batch).
    _, builder2, state2 = setup(tmp_path, *args)
    acc = 0.0
    g_trained = 0
    bs = builder2.opt.batch_size
    for i in range(5):
        kk = step_key_row(rng, i)
        x = images[perm[i * bs:(i + 1) * bs]]
        y = labels[perm[i * bs:(i + 1) * bs]]
        state2, m = builder2._d_core(state2, x, y, x, y, x, y, kk[0:3],
                                     False)
        acc += float(m["d_adv_loss"])
        if i % n_d == 0:
            if acc / n_d < thresh:
                state2, _ = builder2._g_step(state2, kk[3:5])
                g_trained += 1
            acc = 0.0
    assert int(g_count) == g_trained
    assert 0 < g_trained < 3  # the threshold actually bites both ways
    np.testing.assert_allclose(float(acc_out), acc, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.g_params),
                    jax.tree_util.tree_leaves(state2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_trainer_scan_vs_host_loop_losses(tmp_path):
    """Both loop modes must train (losses finite, params move); exact
    equality is not expected (different rng threading)."""
    import train as train_cli
    for mode, flag in [("scan", "false"), ("host", "true")]:
        out = str(tmp_path / mode)
        train_cli.main(["MNIST", "-tss", "200", "-ne", "2", "-bs", "50",
                        "--manual_seed", "5", "--log_every", "200",
                        "--sample_every", "100000", "--save_every", "2",
                        "--host_loop", flag, "-o", out])
        import csv
        with open(out + "/log.csv") as f:
            rows = [r for r in csv.reader(f) if r and r[0] != "Epoch"]
        assert len(rows) >= 2
        vals = [float(v) for v in rows[-1][2:]]
        assert all(np.isfinite(v) for v in vals)


def test_scan_with_mesh_sharding_matches(tmp_path):
    """Segment runner with a data-axis sharding constraint over the 8-device
    mesh must match the unsharded result."""
    from csl_gan_tpu.parallel import make_mesh
    ctx = make_mesh(n=8)
    opt, builder, state = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0", bs=16)
    images, labels = make_data(n=64, bs=16)
    perm = jnp.arange(64)
    g_mask = jnp.asarray([True, False, True])
    rng = jax.random.PRNGKey(11)

    r_plain = builder.build_segment_runner(use_dp=True)
    s1, *_ = r_plain(state, rng, images, labels, perm, 0, g_mask, jnp.zeros(()), jnp.zeros(()))

    _, builder2, state2 = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0", bs=16)
    r_shard = builder2.build_segment_runner(use_dp=True,
                                            batch_sharding=ctx.batch)
    state2 = ctx.put_replicated(state2)
    s2, *_ = r_shard(state2, rng, ctx.put_replicated(images),
                     ctx.put_replicated(labels), ctx.put_replicated(perm),
                     0, g_mask, jnp.zeros(()), jnp.zeros(()))
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(s2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_flat_image_table_matches_nhwc(tmp_path):
    """Flat [N, F] device image storage (training/loop.py
    _setup_device_data) must be bit-identical to natural-layout storage
    through the segment runner and poisson_draw (unflatten_rows)."""
    opt, builder, state = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0")
    images, labels = make_data()
    perm = jnp.arange(100)
    g_mask = jnp.asarray([True, False, True, False, True])
    rng = jax.random.PRNGKey(7)

    r1 = builder.build_segment_runner(use_dp=True)
    s1, *_ = r1(state, rng, images, labels, perm, 0, g_mask,
                jnp.zeros(()), jnp.zeros(()))

    _, builder2, state2 = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0")
    builder2.img_shape = images.shape[1:]
    flat = images.reshape(len(images), -1)
    r2 = builder2.build_segment_runner(use_dp=True)
    s2, *_ = r2(state2, rng, flat, labels, perm, 0, g_mask,
                jnp.zeros(()), jnp.zeros(()))
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(s2.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # poisson_draw returns unflattened rows from a flat table.
    builder2.poisson = True
    builder2.poisson_q = 0.2
    builder2.poisson_cap = 30
    x, y, valid = builder2.poisson_draw(flat, labels, jax.random.PRNGKey(3))
    assert x.shape == (30, 28, 28, 1)

    # Label-packed flat table (loop._setup_device_data packs y as a
    # trailing f32 column; steps.gather_batch splits after ONE gather)
    # must also be bit-identical — and y must really come from the table:
    # the labels argument is replaced with garbage.
    _, builder3, state3 = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0")
    builder3.img_shape = images.shape[1:]
    builder3.labels_in_table = True
    packed = jnp.concatenate(
        [flat, labels.astype(jnp.float32)[:, None]], axis=1)
    garbage = jnp.full_like(labels, 7)
    r3 = builder3.build_segment_runner(use_dp=True)
    s3, *_ = r3(state3, rng, packed, garbage, perm, 0, g_mask,
                jnp.zeros(()), jnp.zeros(()))
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(s3.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    builder3.poisson = True
    builder3.poisson_q = 0.2
    builder3.poisson_cap = 30
    xp, yp, _ = builder3.poisson_draw(packed, garbage, jax.random.PRNGKey(3))
    assert xp.shape == (30, 28, 28, 1)
    np.testing.assert_array_equal(np.asarray(yp), np.asarray(y))


def test_acc_in_chains_segment_sums(tmp_path):
    """Two chained segments passing acc_in must produce the same metric sums
    and params as one segment over all the steps."""
    opt, builder, state = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0")
    images, labels = make_data()
    perm = jnp.arange(100)
    rng = jax.random.PRNGKey(7)

    runner = builder.build_segment_runner(use_dp=True)
    mask = jnp.asarray([True, False, True, False, True])
    s_all, rng_a, d_all, g_all, c_all, _ = runner(
        state, rng, images, labels, perm, 0, mask, jnp.zeros(()),
        jnp.zeros(()))

    _, builder2, state2 = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0")
    r2 = builder2.build_segment_runner(use_dp=True)
    st, rng_b, d1, g1, c1, th = r2(state2, rng, images, labels, perm, 0,
                                   mask[:3], jnp.zeros(()), jnp.zeros(()))
    st, rng_b, d2, g2, c2, th = r2(st, rng_b, images, labels, perm, 3,
                                   mask[3:], jnp.zeros(()), th, (d1, g1, c1))
    assert int(c2) == int(c_all)
    for k in d_all:
        np.testing.assert_allclose(np.asarray(d_all[k]), np.asarray(d2[k]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_all.d_params),
                    jax.tree_util.tree_leaves(st.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_key_perm_matches_explicit_perm(tmp_path):
    """Passing a uint32[2] PRNG key as `perm` must equal passing the
    explicitly computed permutation(fold_in(key, epoch), N)."""
    opt, builder, state = setup(tmp_path, "--conditional")
    images, labels = make_data()
    g_mask = jnp.asarray([True, True, True, True, True])
    rng = jax.random.PRNGKey(7)
    key = jax.random.PRNGKey(42)
    epoch = 3

    runner = builder.build_segment_runner(use_dp=False)
    s1, *_ = runner(state, rng, images, labels, key, 0, g_mask,
                    jnp.zeros(()), jnp.zeros(()), None, epoch)

    _, builder2, state2 = setup(tmp_path, "--conditional")
    perm = jax.random.permutation(jax.random.fold_in(key, epoch), 100)
    r2 = builder2.build_segment_runner(use_dp=False)
    # same epoch on both sides: step subkeys fold the epoch in too
    s2, *_ = r2(state2, rng, images, labels, perm, 0, g_mask,
                jnp.zeros(()), jnp.zeros(()), None, epoch)
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(s2.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_cadence_matches_cond(tmp_path):
    """assume_full_cadence=True (no lax.cond) must match the cond-based
    runner when the mask is all-True."""
    opt, builder, state = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0")
    images, labels = make_data()
    perm = jnp.arange(100)
    g_mask = jnp.ones(5, bool)
    rng = jax.random.PRNGKey(7)

    r1 = builder.build_segment_runner(use_dp=True)
    s1, _, d1, g1, c1, _ = r1(state, rng, images, labels, perm, 0, g_mask,
                              jnp.zeros(()), jnp.zeros(()))

    _, builder2, state2 = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0")
    r2 = builder2.build_segment_runner(use_dp=True,
                                       assume_full_cadence=True)
    s2, _, d2, g2, c2, _ = r2(state2, rng, images, labels, perm, 0, g_mask,
                              jnp.zeros(()), jnp.zeros(()))
    assert int(c1) == int(c2) == 5
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_acc_in_chains_is_extremes(tmp_path):
    """IS-mode interval extremes (is_sens_min/max) must chain across
    segments through acc_in exactly as one segment over all steps."""
    opt, builder, state = setup(tmp_path, "--conditional", "-dpm", "is",
                                "--sigma", "0.1")
    images, labels = make_data()
    perm = jnp.arange(100)
    mask = jnp.asarray([True, True, True, True, True])
    rng = jax.random.PRNGKey(7)

    runner = builder.build_segment_runner(use_dp=True)
    _, _, d_all, *_ = runner(state, rng, images, labels, perm, 0, mask,
                             jnp.zeros(()), jnp.zeros(()))

    _, builder2, state2 = setup(tmp_path, "--conditional", "-dpm", "is",
                                "--sigma", "0.1")
    r2 = builder2.build_segment_runner(use_dp=True)
    st, rng_b, d1, g1, c1, th = r2(state2, rng, images, labels, perm, 0,
                                   mask[:2], jnp.zeros(()), jnp.zeros(()))
    _, _, d2, *_ = r2(st, rng_b, images, labels, perm, 2, mask[2:],
                      jnp.zeros(()), th, (d1, g1, c1))
    for k in ("is_sens", "is_sens_min", "is_sens_max"):
        np.testing.assert_allclose(np.asarray(d_all[k]), np.asarray(d2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    assert float(d2["is_sens_min"]) <= float(d2["is_sens"]) / 5


def _zero_acc_like(runner, args):
    """Zero acc_in template from the runner's output structure (the test
    replica of loop.py _zero_scan_acc, without the mesh put)."""
    out_s = jax.eval_shape(runner, *args)
    z = lambda t: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), t)
    return z(out_s[2]), z(out_s[3]), z(out_s[4])


def test_epochs_runner_matches_chained_epoch_dispatches(tmp_path):
    """build_epochs_runner over k epochs must be BIT-IDENTICAL to k chained
    single-epoch segment dispatches (same rng chain, same on-device
    permutation derivation from (key, epoch), same acc_in threading) —
    the multi-epoch dispatch amortization must not change training."""
    argv = ("--conditional", "-dpm", "gc", "--sigma", "0.5")
    opt, builder, state = setup(tmp_path, *argv)
    images, labels = make_data()
    perm_key = jax.random.PRNGKey(5)  # raw key: on-device per-epoch perms
    g_mask = jnp.asarray([True, False, True, False, True])
    rng = jax.random.PRNGKey(7)
    k = 3

    seg = builder.build_segment_runner(use_dp=True)
    seg_args = (state, rng, images, labels, perm_key, 0, g_mask,
                jnp.zeros(()), jnp.zeros(()), None, 0)
    acc = _zero_acc_like(seg, seg_args)
    st, r, th = state, rng, jnp.zeros(())
    for e in range(k):
        st, r, d_s, g_s, g_c, th = seg(st, r, images, labels, perm_key, 0,
                                       g_mask, jnp.zeros(()), th, acc, e)
        acc = (d_s, g_s, g_c)

    _, builder2, state2 = setup(tmp_path, *argv)
    epochs = builder2.build_epochs_runner(use_dp=True, n_epochs=k,
                                          n_batches=5)
    seg2 = builder2.build_segment_runner(use_dp=True)
    acc0 = _zero_acc_like(seg2, (state2, rng, images, labels, perm_key, 0,
                                 g_mask, jnp.zeros(()), jnp.zeros(()), None,
                                 0))
    st2, r2, d_s2, g_s2, g_c2, th2 = epochs(
        state2, rng, images, labels, perm_key, g_mask, jnp.zeros(()),
        jnp.zeros(()), acc0, 0)

    assert int(g_c2) == int(acc[2])
    for a, b in zip(jax.tree_util.tree_leaves(st.d_params),
                    jax.tree_util.tree_leaves(st2.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(st.g_params),
                    jax.tree_util.tree_leaves(st2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for key in acc[0]:
        np.testing.assert_array_equal(np.asarray(acc[0][key]),
                                      np.asarray(d_s2[key]))
    np.testing.assert_array_equal(np.asarray(th), np.asarray(th2))


def test_unsigned_non_key_perm_rejected(tmp_path):
    """An explicit uint32 permutation array must be rejected, not silently
    replaced with a derived permutation (only raw key shapes (2,)/(4,) and
    typed keys are treated as keys)."""
    import pytest
    opt, builder, state = setup(tmp_path)
    images, labels = make_data()
    runner = builder.build_segment_runner(use_dp=False)
    bad_perm = jnp.arange(100, dtype=jnp.uint32)
    with pytest.raises(TypeError, match="unsigned"):
        runner(state, jax.random.PRNGKey(0), images, labels, bad_perm, 0,
               jnp.asarray([True]), jnp.zeros(()), jnp.zeros(()))


def test_phase_carry_bit_identical(tmp_path):
    """--phase_carry (the segment scan carries the DCResNet G's collapsed
    phase kernels across D steps, recomputing them only in the G-update
    branch) must be BIT-IDENTICAL to recomputing the collapse inside every
    D step's fresh-fake G forward — the collapse is the same weight-only
    math either way (models/dcresnet.py collapse_phase_kernel)."""
    argv = ("--conditional", "-dpm", "gc", "--sigma", "0.5",
            "--model", "DeepConvResNet",
            # The DP-DCResNet default forces threshold -1, which gates G
            # off at early D losses — disable gating so the G-update branch
            # (cache recompute) actually runs; the skip branch is still
            # exercised by the False cadence-mask entries.
            "--train_d_until_threshold", "1e18")
    images, labels = make_data(n=32, bs=8)
    perm = jnp.arange(32)
    # Mixed cadence: the cache must survive skip steps (carried through the
    # lax.cond false branch) and refresh on G updates.
    g_mask = jnp.asarray([True, False, True, False])
    rng = jax.random.PRNGKey(7)

    opt, b_on, s_on = setup(tmp_path, *argv, bs=8)
    assert b_on.use_phase_carry
    assert b_on.phase_collapse(s_on.g_params)  # non-empty cache tree
    r_on = b_on.build_segment_runner(use_dp=True)
    s1, _, d1, g1, c1, _ = r_on(s_on, rng, images, labels, perm, 0, g_mask,
                                jnp.zeros(()), jnp.zeros(()))

    _, b_off, s_off = setup(tmp_path, *argv, "--phase_carry", "false", bs=8)
    assert not b_off.use_phase_carry
    r_off = b_off.build_segment_runner(use_dp=True)
    s2, _, d2, g2, c2, _ = r_off(s_off, rng, images, labels, perm, 0, g_mask,
                                 jnp.zeros(()), jnp.zeros(()))

    assert int(c1) == int(c2) == 2
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(s2.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in d1:
        np.testing.assert_array_equal(np.asarray(d1[k]), np.asarray(d2[k]),
                                      err_msg=k)


def test_bf16_table_exact_on_representable_pixels(tmp_path):
    """--bf16_table storage must be LOSSLESS for pixel values exactly
    representable in bfloat16 (multiples of 1/128 in [0,1) — coarser than
    u8 quantization): the segment runner on a bf16-stored packed table
    must train BIT-IDENTICALLY to the f32-stored one, and labels/one-hot
    columns must round-trip exactly."""
    opt, builder, state = setup(tmp_path, "--conditional", "-dpm", "gc",
                                "--sigma", "0")
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    images = jax.random.randint(kx, (100, 28, 28, 1), 0, 128) / 128.0
    labels = jax.random.randint(ky, (100,), 0, 10)
    perm = jnp.arange(100)
    g_mask = jnp.asarray([True, False, True])
    rng = jax.random.PRNGKey(7)

    def packed(dtype):
        flat = images.reshape(100, -1)
        eye = jnp.eye(10)[labels]
        return jnp.concatenate(
            [flat, eye, labels.astype(jnp.float32)[:, None]],
            axis=1).astype(dtype)

    outs = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        _, b, s = setup(tmp_path, "--conditional", "-dpm", "gc",
                        "--sigma", "0")
        b.img_shape = images.shape[1:]
        b.labels_in_table = True
        b.onehot_in_table = True
        r = b.build_segment_runner(use_dp=True)
        outs[dtype], *_ = r(s, rng, packed(dtype), labels, perm, 0, g_mask,
                            jnp.zeros(()), jnp.zeros(()))
    for a, b2 in zip(jax.tree_util.tree_leaves(outs[jnp.float32].d_params),
                     jax.tree_util.tree_leaves(outs[jnp.bfloat16].d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))

# ---------------- cadence-grouped fake batching (--group_fakes) ----------------
#
# Note on data sizing: these tests allocate >= (start + n) batches of rows.
# A segment reaching past the permutation makes dynamic_slice CLAMP, and the
# grouped block gather clamps differently from per-step gathers — an
# artifact of driving the runner out of its contract (production segments
# never exceed the epoch), not a code path to reconcile.


def _assert_trees_close(t1, t2, rtol=1e-5, atol=1e-6, msg=""):
    for a, b in zip(jax.tree_util.tree_leaves(t1),
                    jax.tree_util.tree_leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol, err_msg=msg)


def test_batch_fakes_matches_per_step(tmp_path):
    """The core semantic claim of --group_fakes: slice j of the batched
    fake forward equals the per-step fresh-fake generation for the same z
    key and labels (same z values by construction; per-sample model math
    is batch-size-invariant up to reduce order)."""
    opt, builder, state = setup(tmp_path, "--conditional")
    rng = jax.random.PRNGKey(7)
    base = jax.random.fold_in(rng, 0)
    rows = jax.vmap(jax.vmap(lambda t: jax.random.fold_in(base, t)))(
        jnp.arange(3)[:, None] * 8 + jnp.arange(8)[None, :])
    Y = jax.random.randint(jax.random.PRNGKey(3), (3, 20), 0, 10)
    F = builder.batch_fakes(state, rows, Y)
    assert F.shape[:2] == (3, 20)
    for j in range(3):
        z = builder.gen_z(rows[j][0], 20)
        f, _ = builder._fake_images(state, z, Y[j])
        np.testing.assert_allclose(np.asarray(F[j]), np.asarray(f),
                                   rtol=1e-5, atol=2e-6)


def test_grouped_matches_per_batch(tmp_path):
    """Grouped runner == per-batch runner (head + two full cadence groups)
    for plain, gc, and is modes."""
    for extra, use_dp in (((), False),
                          (("-dpm", "gc", "--sigma", "0.5"), True),
                          (("-dpm", "is", "--sigma", "0.5"), True)):
        argv = ("--conditional", "--n_d_steps", "3",
                "--group_fakes", "true", *extra)
        images, labels = make_data(n=200)
        perm = jnp.arange(200)
        n = 7  # head 1 + two full groups of 3
        g_mask = jnp.asarray(np.arange(n) % 3 == 0)
        rng = jax.random.PRNGKey(7)

        opt, b1, s1 = setup(tmp_path, *argv)
        r_u = b1.build_segment_runner(use_dp=use_dp)
        su, _, du, gu, cu, au = r_u(s1, rng, images, labels, perm, 0,
                                    g_mask, jnp.zeros(()), jnp.zeros(()))

        _, b2, s2 = setup(tmp_path, *argv)
        assert b2.grouped_runner_ok(use_dp)
        r_g = b2.build_segment_runner(use_dp=use_dp, grouped=True)
        sg, _, dg, gg, cg, ag = r_g(s2, rng, images, labels, perm, 0,
                                    g_mask, jnp.zeros(()), jnp.zeros(()))

        assert int(cu) == int(cg) == 3
        _assert_trees_close(su.d_params, sg.d_params, msg=str(extra))
        _assert_trees_close(su.g_params, sg.g_params, msg=str(extra))
        assert set(du) == set(dg) and set(gu) == set(gg)
        _assert_trees_close(du, dg, atol=1e-4, msg=str(extra))
        _assert_trees_close(gu, gg, atol=1e-4, msg=str(extra))
        np.testing.assert_allclose(np.asarray(au), np.asarray(ag),
                                   rtol=1e-5, atol=1e-6)


def test_grouped_start_offset_and_tail(tmp_path):
    """A segment starting mid-group (start % n_d != 0 -> head of p+1
    steps) and one ending in a trailing partial group must both match the
    per-batch runner."""
    argv = ("--conditional", "--n_d_steps", "3", "-dpm", "gc",
            "--sigma", "0.5", "--group_fakes", "true")
    images, labels = make_data(n=200)
    perm = jnp.arange(200)
    rng = jax.random.PRNGKey(3)

    for start, n in ((2, 5),   # p=1: head 2, one full group, no tail
                     (0, 5),   # head 1 + one full group + tail 1
                     (4, 6)):  # p=2: head 3, one full group, no tail
        g_mask = jnp.asarray((np.arange(start, start + n) % 3) == 0)
        opt, b1, s1 = setup(tmp_path, *argv)
        r_u = b1.build_segment_runner(use_dp=True)
        su, _, du, gu, cu, _ = r_u(s1, rng, images, labels, perm, start,
                                   g_mask, jnp.zeros(()), jnp.zeros(()))
        _, b2, s2 = setup(tmp_path, *argv)
        r_g = b2.build_segment_runner(use_dp=True, grouped=True,
                                      grouped_p=start % 3)
        sg, _, dg, gg, cg, _ = r_g(s2, rng, images, labels, perm, start,
                                   g_mask, jnp.zeros(()), jnp.zeros(()))
        assert int(cu) == int(cg) == 2, f"start={start}"
        _assert_trees_close(du, dg, atol=1e-4, msg=f"start={start}")
        _assert_trees_close(gu, gg, atol=1e-4, msg=f"start={start}")
        _assert_trees_close(su.d_params, sg.d_params, msg=f"start={start}")
        _assert_trees_close(su.g_params, sg.g_params, msg=f"start={start}")


def test_grouped_threshold_gating_matches(tmp_path):
    """Threshold gating composes with grouping: the group BOUNDARY is
    static (G can only change at cadence points) while whether the update
    fires is data-dependent — the grouped runner's lax.cond at each
    boundary must reproduce the per-batch runner's gating decisions,
    update counts, and accumulator values."""
    argv = ("--conditional", "--n_d_steps", "2", "-dpm", "gc",
            "--sigma", "0.5", "--train_d_until_threshold", "0.9",
            "--group_fakes", "true")
    images, labels = make_data(n=200)
    perm = jnp.arange(200)
    n = 7
    g_mask = jnp.asarray(np.arange(n) % 2 == 0)
    rng = jax.random.PRNGKey(11)

    opt, b1, s1 = setup(tmp_path, *argv)
    r_u = b1.build_segment_runner(use_dp=True)
    su, _, du, gu, cu, au = r_u(s1, rng, images, labels, perm, 0, g_mask,
                                jnp.zeros(()), jnp.zeros(()))

    _, b2, s2 = setup(tmp_path, *argv)
    r_g = b2.build_segment_runner(use_dp=True, grouped=True)
    sg, _, dg, gg, cg, ag = r_g(s2, rng, images, labels, perm, 0, g_mask,
                                jnp.zeros(()), jnp.zeros(()))
    # The gating must actually vary for this test to mean anything.
    assert 0 < int(cu) < 4
    assert int(cu) == int(cg)
    np.testing.assert_allclose(np.asarray(au), np.asarray(ag),
                               rtol=1e-5, atol=1e-6)
    _assert_trees_close(su.d_params, sg.d_params)
    _assert_trees_close(su.g_params, sg.g_params)


def test_grouped_epochs_runner_matches(tmp_path):
    """build_epochs_runner(grouped=True) must be BIT-IDENTICAL to chained
    grouped per-epoch segment dispatches (same body, same key schedule),
    and match the ungrouped epochs runner at reduce-order tolerance."""
    argv = ("--conditional", "--n_d_steps", "2", "-dpm", "gc",
            "--sigma", "0.5", "--group_fakes", "true")
    images, labels = make_data(n=200)
    perm_key = jax.random.PRNGKey(5)
    n, k = 5, 3
    g_mask = jnp.asarray(np.arange(n) % 2 == 0)
    rng = jax.random.PRNGKey(7)

    opt, b1, s1 = setup(tmp_path, *argv)
    seg = b1.build_segment_runner(use_dp=True, grouped=True)
    seg_args = (s1, rng, images, labels, perm_key, 0, g_mask,
                jnp.zeros(()), jnp.zeros(()), None, 0)
    acc = _zero_acc_like(b1.build_segment_runner(use_dp=True), seg_args)
    st, r, th = s1, rng, jnp.zeros(())
    for e in range(k):
        st, r, d_s, g_s, g_c, th = seg(st, r, images, labels, perm_key, 0,
                                       g_mask, jnp.zeros(()), th, acc, e)
        acc = (d_s, g_s, g_c)

    _, b2, s2 = setup(tmp_path, *argv)
    epochs = b2.build_epochs_runner(use_dp=True, n_epochs=k, n_batches=n,
                                    grouped=True)
    acc0 = _zero_acc_like(b2.build_segment_runner(use_dp=True),
                          (s2, rng, images, labels, perm_key, 0, g_mask,
                           jnp.zeros(()), jnp.zeros(()), None, 0))
    st2, r2, d_s2, g_s2, g_c2, th2 = epochs(
        s2, rng, images, labels, perm_key, g_mask, jnp.zeros(()),
        jnp.zeros(()), acc0, 0)
    assert int(g_c2) == int(acc[2])
    for a, b in zip(jax.tree_util.tree_leaves(st.d_params),
                    jax.tree_util.tree_leaves(st2.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for key in acc[0]:
        np.testing.assert_array_equal(np.asarray(acc[0][key]),
                                      np.asarray(d_s2[key]))
    np.testing.assert_array_equal(np.asarray(th), np.asarray(th2))

    # Whole grouped multi-epoch trajectory vs the ungrouped epochs runner.
    _, b3, s3 = setup(tmp_path, *argv)
    epochs_u = b3.build_epochs_runner(use_dp=True, n_epochs=k, n_batches=n)
    acc0u = _zero_acc_like(b3.build_segment_runner(use_dp=True),
                           (s3, rng, images, labels, perm_key, 0, g_mask,
                            jnp.zeros(()), jnp.zeros(()), None, 0))
    st3, _, _, _, g_c3, _ = epochs_u(s3, rng, images, labels, perm_key,
                                     g_mask, jnp.zeros(()), jnp.zeros(()),
                                     acc0u, 0)
    assert int(g_c3) == int(g_c2)
    _assert_trees_close(st2.d_params, st3.d_params, rtol=1e-4, atol=1e-5)
    _assert_trees_close(st2.g_params, st3.g_params, rtol=1e-4, atol=1e-5)


def test_grouped_dcresnet_phase_carry(tmp_path):
    """Grouped runner on the DCResNet family with the phase cache in the
    carry: the batched fake forward consumes the carried cache, the
    G-update boundary refreshes it, and the trajectory matches the
    per-batch runner (conv/GN reduce-order tolerance)."""
    argv = ("--conditional", "-dpm", "gc", "--sigma", "0.5",
            "--model", "DeepConvResNet", "--n_d_steps", "2",
            "--train_d_until_threshold", "1e18", "--group_fakes", "true")
    images, labels = make_data(n=32, bs=8)
    perm = jnp.arange(32)
    g_mask = jnp.asarray([True, False, True, False])
    rng = jax.random.PRNGKey(7)

    opt, b1, s1 = setup(tmp_path, *argv, bs=8)
    assert b1.use_phase_carry and b1.grouped_runner_ok(True)
    r_u = b1.build_segment_runner(use_dp=True)
    su, _, du, gu, cu, _ = r_u(s1, rng, images, labels, perm, 0, g_mask,
                               jnp.zeros(()), jnp.zeros(()))

    _, b2, s2 = setup(tmp_path, *argv, bs=8)
    r_g = b2.build_segment_runner(use_dp=True, grouped=True)
    sg, _, dg, gg, cg, _ = r_g(s2, rng, images, labels, perm, 0, g_mask,
                               jnp.zeros(()), jnp.zeros(()))
    assert int(cu) == int(cg) == 2
    # Conv/GN reduce-order drift amplifies slightly through Adam on the
    # 4-step trajectory (observed: a handful of elements at ~3e-4 abs on
    # some CPU runs) — bound well above drift, far below any
    # key/cache-misalignment signature (O(1e-2) over most elements).
    _assert_trees_close(su.d_params, sg.d_params, rtol=5e-3, atol=1e-3)
    _assert_trees_close(su.g_params, sg.g_params, rtol=5e-3, atol=1e-3)
    for key in du:
        np.testing.assert_allclose(np.asarray(du[key]),
                                   np.asarray(dg[key]), rtol=5e-3,
                                   atol=1e-3, err_msg=key)


def test_u8_table_dequant_within_one_ulp(tmp_path):
    """--u8_table: pixels stored x255 as uint8 dequantize to within ONE ULP
    of the fp32 loader pixels (k/255). Bit-exactness is NOT achievable:
    XLA lowers the /255 as multiply-by-reciprocal (measured 6e-8 = 1 ulp
    on CPU and TPU), so the contract is <= 1-ulp pixels — still ~100x
    tighter than the default --bf16_table storage rounding (2^-9
    relative). Labels round-trip exactly; the short training trajectory
    stays within reduce-order tolerance of the f32-table one."""
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    raw = jax.random.randint(kx, (100, 28, 28, 1), 0, 256)
    images = raw.astype(jnp.float32) / 255.0
    labels = jax.random.randint(ky, (100,), 0, 10)
    perm = jnp.arange(100)
    g_mask = jnp.asarray([True, False, True])
    rng = jax.random.PRNGKey(7)

    # Direct dequant contract: <= 1 ulp of the loader pixels, labels exact.
    _, bu, _ = setup(tmp_path, "--conditional", "-dpm", "gc",
                     "--sigma", "0")
    bu.img_shape = images.shape[1:]
    bu.labels_in_table = True
    table_u8 = jnp.concatenate(
        [raw.reshape(100, -1).astype(jnp.uint8),
         labels.astype(jnp.uint8)[:, None]], axis=1)
    x, yy = jax.jit(bu.gather_batch)(table_u8, labels, jnp.arange(20))
    np.testing.assert_allclose(np.asarray(x),
                               np.asarray(images[:20]), rtol=0, atol=6e-8)
    np.testing.assert_array_equal(np.asarray(yy), np.asarray(labels[:20]))

    outs = {}
    for mode in ("f32", "u8"):
        _, b, s = setup(tmp_path, "--conditional", "-dpm", "gc",
                        "--sigma", "0")
        b.img_shape = images.shape[1:]
        b.labels_in_table = True
        if mode == "f32":
            table = jnp.concatenate(
                [images.reshape(100, -1),
                 labels.astype(jnp.float32)[:, None]], axis=1)
        else:
            table = table_u8
        r = b.build_segment_runner(use_dp=True)
        outs[mode], *_ = r(s, rng, table, labels, perm, 0, g_mask,
                           jnp.zeros(()), jnp.zeros(()))
    for a, b2 in zip(jax.tree_util.tree_leaves(outs["f32"].d_params),
                     jax.tree_util.tree_leaves(outs["u8"].d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-5, atol=1e-6)


def test_u8_table_trainer_end_to_end(tmp_path):
    """--u8_table through the real Trainer: the device table is stored
    uint8, training runs, and the megakernel eligibility flag
    (onehot_in_table) is off so the XLA scan path is used."""
    import train as train_cli
    out = str(tmp_path / "u8run")
    train_cli.main(["MNIST", "-tss", "200", "-ne", "1", "-bs", "50",
                    "--manual_seed", "5", "--u8_table", "true",
                    "--log_every", "200", "--sample_every", "100000",
                    "--save_every", "5", "-o", out])
    import csv
    with open(out + "/log.csv") as f:
        rows = list(csv.reader(f))
    assert len(rows) >= 2 and float(rows[1][2]) != 0.0
