"""Config-interaction fuzz: trace the production step path for a broad,
deterministic sample of flag combinations.

Round-1 review found a config (CelebA --conditional + per-layer clipping)
that crashed only at init because no test crossed those axes. This fuzz
closes that class: it samples configs across every risky axis pair
(dataset/model x conditional arch x dp mode x clip mode x split/chunk/
poisson/bf16/...), builds the real options -> models -> TrainStepBuilder ->
init_state pipeline, and traces the REAL segment runner (steps.py
build_segment_runner — the production scan path) with jax.eval_shape, which
exercises every trace-time code path without compiling (so CelebA-sized
models cost seconds, not minutes).

A config rejected by options.derive_and_validate's intentional rules is a
PASS (clear config-time error, the behavior the reference lacked); anything
else raising is a genuine bug and fails the test with the argv that found it.
"""

import os
import random
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csl_gan_tpu import options  # noqa: E402
from csl_gan_tpu.models.registry import init_models  # noqa: E402
from csl_gan_tpu.training.logger import build_logger  # noqa: E402
from csl_gan_tpu.training.steps import TrainStepBuilder  # noqa: E402

BS = 8
TSS = 40


def _sample_argv(rng: random.Random):
    """One random flag combination over the risky axes."""
    argv = []
    ds, model = rng.choice([
        ("MNIST", "Vanilla"), ("MNIST", "DeepConvResNet"),
        ("CelebA", None), ("CelebA", None)])
    argv.append(ds)
    if model:
        argv += ["--model", model]
    if ds == "CelebA" and rng.random() < 0.5:
        argv += ["--im_size", "48"]

    cond = rng.choice([None, "ACGAN", "ACGAN", "CGAN", "WCGAN"])
    if cond:
        argv += ["--conditional", "--conditional_arch", cond]
        argv += ["--aux_loss_type",
                 rng.choice(["wasserstein", "cross_entropy"])]
        if rng.random() < 0.3:
            argv += ["--d_fake_aux_loss", "false"]
        if rng.random() < 0.2:
            argv += ["--aux_penalty", "false"]
        if rng.random() < 0.2:
            argv += ["--g_label_emb_mode", "embed"]
        if rng.random() < 0.1:
            argv += ["--d_label_emb_mode", "embed"]  # expected rejection

    dpm = rng.choice([None, "gc", "gc", "gc", "is", "tm", "sv"])
    if dpm:
        argv += ["-dpm", dpm]
        # mean samples satisfy the penalty/adaptive public-data rules
        argv += ["-nms", "1", "--mean_sample_size", "4"]
    if dpm == "gc":
        argv += ["-gcm", rng.choice(["standard", "adaptive",
                                     "constant-pl", "adaptive-pl"])]
        if rng.random() < 0.3:
            argv += ["-gcs", "false"]
        if rng.random() < 0.25:
            argv += ["--poisson", "true"]
        if rng.random() < 0.25:
            argv += ["--per_sample_chunk", "4"]
        if rng.random() < 0.25:
            argv += ["--conv_ghost", "false"]
    if dpm == "is":
        mode = rng.choice(["standard", "constant-pl", "moving-avg-pl"])
        argv += ["-issm", mode]
        if rng.random() < 0.4:
            argv += ["-ispp", "true"]
    if rng.random() < 0.25:
        argv += ["--bf16", "true"]
    if ds == "MNIST" and rng.random() < 0.3:
        # MNIST default has no penalty; exercise penalties there too
        argv += ["--penalty",
                 rng.choice(["WGAN-GP", "WGAN-GP1", "DRAGAN", "DRAGAN1"])]
        if dpm and rng.random() < 0.5:
            argv += ["-pupd", "false"]   # per-sample penalty path
    if ds == "MNIST" and model is None and dpm == "gc" \
            and rng.random() < 0.2:
        argv += ["-bpc", "true"]
    if rng.random() < 0.3:
        argv += ["--n_d_steps", "2", "--train_d_until_threshold", "0.5"]
    elif rng.random() < 0.2:
        # Cadence without threshold gating: the grouped fake-batching
        # runner's primary operating point (the threshold case above also
        # reaches it — grouping composes with gating).
        argv += ["--n_d_steps", "3"]
    if dpm and rng.random() < 0.15:
        # Non-private warmup before DP training (loop.py warmup()).
        argv += ["--warmup_iter", "2"]
    # Round-4/5 perf-path axes (each default-on; crossing them OFF against
    # the other axes catches interactions their dedicated tests miss).
    if rng.random() < 0.2:
        argv += ["--phase_carry", "false"]
    if rng.random() < 0.2:
        argv += ["--phase_gn4", "false"]
    elif rng.random() < 0.25:
        argv += ["--phase_gn4_max_f", rng.choice(["64", "128", "0"])]
    if rng.random() < 0.25:
        argv += ["--group_fakes", "true"]   # measured-negative default-off
    if rng.random() < 0.2:
        argv += ["--bf16_table", "false"]
    if rng.random() < 0.15:
        argv += ["--stop_on_g_freeze", "2"]
    if rng.random() < 0.15 and model != "Vanilla":
        argv += ["--ref_pixel_shuffle", "true"]
    return argv


def _trace_config(argv, tmp_path, i):
    out = str(tmp_path / f"f{i}")
    full = argv + ["-bs", str(BS), "-tss", str(TSS), "--manual_seed", "3",
                   "-ne", "1", "-o", out]
    try:
        opt = options.parse(full)
    except SystemExit as e:  # argparse-level rejection = config error, fine
        return "rejected"
    except Exception as e:
        # Intentional validation rules raise bare Exception/ValueError with a
        # human-readable message; anything else is a bug.
        assert type(e) in (Exception, ValueError), \
            f"unexpected {type(e).__name__} from options.parse({full}): {e}"
        return "rejected"

    try:
        (G, G_vars), (D, D_vars) = init_models(opt, abstract=True)
        builder = TrainStepBuilder(opt, G, D)
        state = builder.init_state(G_vars, D_vars)
    except Exception as e:
        # Intentional construction-time raises (bare Exception with a clear
        # message, e.g. the reference's "Cross entropy loss is the only aux
        # loss supported for vanilla architecture", MNIST_models.py:34) are
        # the contract; anything typed is a bug.
        assert type(e) in (Exception, ValueError), \
            f"unexpected {type(e).__name__} at init for {full}: {e}"
        return "rejected"
    build_logger(opt, os.path.join(out, "log.csv"))

    im_shape = (28, 28, 1) if opt.dataset == "MNIST" \
        else (opt.im_size, opt.im_size, 3)
    f32, i32 = jnp.float32, jnp.int32
    images = jax.ShapeDtypeStruct((TSS, *im_shape), f32)
    if opt.dataset == "MNIST":
        # Flat device image table with packed label column, in the storage
        # dtype the Trainer would choose (loop._setup_device_data):
        # crosses --bf16_table with the other axes through gather_batch.
        builder.img_shape = im_shape
        builder.labels_in_table = True
        flat = 1
        for d in im_shape:
            flat *= d
        tdtype = jnp.bfloat16 if options.opt_get(opt, "bf16_table", True) \
            else f32
        images = jax.ShapeDtypeStruct((TSS, flat + 1), tdtype)
    labels = jax.ShapeDtypeStruct((TSS,), i32)
    perm = jax.ShapeDtypeStruct((TSS,), i32)
    g_mask = jax.ShapeDtypeStruct((3,), jnp.bool_)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    zero = jax.ShapeDtypeStruct((), f32)
    start = jax.ShapeDtypeStruct((), i32)

    use_mean = opt.num_mean_samples > 0

    def mean_fn(ms, k, y, size):
        # Same signature as MeanSampler.device_sample_fn (training/loop.py)
        x = jnp.zeros((size, *im_shape), f32)
        lab = jnp.zeros((size,), i32) if y is None else y[:size]
        return x, lab

    runner = builder.build_segment_runner(
        use_dp=opt.use_dp, mean_sample_fn=mean_fn if use_mean else None)
    jax.eval_shape(runner, state, key, images, labels, perm, start,
                   g_mask, zero, zero)
    if builder.grouped_runner_ok(opt.use_dp):
        # The cadence-grouped fake-batching body (--group_fakes): trace the
        # raw run with start bound to a concrete 0 (it is a static argument
        # of the jitted runner, which eval_shape cannot express).
        from csl_gan_tpu.training import segment_runner
        g_run = segment_runner._build_grouped_run(
            builder, opt.use_dp, mean_fn if use_mean else None, None, None)
        n_d = max(1, int(opt.n_d_steps))
        gm = jax.ShapeDtypeStruct((1 + n_d,), jnp.bool_)
        jax.eval_shape(
            lambda s, k, im, lb, pm, g, z1, z2: g_run(
                s, k, im, lb, pm, 0, g, z1, z2),
            state, key, images, labels, perm, gm, zero, zero)
    # The non-private path is reachable on DP configs only through warmup
    # (loop.py warmup(): warmup_iter > 0, default 0) — tracing it for every
    # DP config doubled the sweep cost for a path production never builds.
    if opt.use_dp and (getattr(opt, "warmup_iter", 0) or 0) > 0:
        plain = builder.build_segment_runner(
            use_dp=False, mean_sample_fn=mean_fn if use_mean else None)
        jax.eval_shape(plain, state, key, images, labels, perm, start,
                       g_mask, zero, zero)
    return "traced"


# 140 cases run by default (~3 min after the round-3 trace speedups:
# phase-conv einsum collapse 3x, warmup-gated plain trace ~1.7x — the full
# 200 measured 46:33 -> 8:21 -> ~5 min across those changes; round 5 added
# the phase_carry/phase_gn4(_max_f)/group_fakes/bf16_table/ref_ps axes and
# the grouped-runner trace, and widened the default from 120); RUN_SLOW
# extends to the full 220.
N_DEFAULT = 140
N_SLOW = 220


@pytest.mark.parametrize("i", range(N_DEFAULT))
def test_config_fuzz(i, tmp_path):
    rng = random.Random(1000 + i)
    argv = _sample_argv(rng)
    _trace_config(argv, tmp_path, i)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="wider fuzz sweep (RUN_SLOW=1)")
@pytest.mark.parametrize("i", range(N_DEFAULT, N_SLOW))
def test_config_fuzz_wide(i, tmp_path):
    rng = random.Random(1000 + i)
    argv = _sample_argv(rng)
    _trace_config(argv, tmp_path, i)
