"""Device-side interval scan: one jitted lax.scan over a logging segment.

Split out of training/steps.py (round-3 refactor): TrainStepBuilder owns the
per-batch step math; this module owns the scan that strings whole logging
intervals — and, with `build_epochs_runner`, whole MULTI-EPOCH spans — into a
single XLA dispatch.

The host dispatches ONCE per segment instead of ~15 ops per batch — the
difference between ~18 ms/step and device-limited throughput on
dispatch-latency-heavy links (and the idiomatic XLA structure everywhere).
Gating of the G update comes from two sources, both jit-safe:
  - the n_d_steps cadence, as a per-batch boolean mask (dynamic input, so
    interval length is the only retrace key);
  - train_d_until_threshold (reference train.py:521-533): the running D
    adversarial-loss sum rides the scan carry and a lax.cond skips the G
    update while its n_d_steps average is above the threshold — so the
    flagship CelebA DP config (threshold forced to -1, options.py) stays on
    this fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resolve_perm(perm, images_n, epoch):
    """An explicit permutation (signed ints) passes through; a PRNG key in
    its place (typed, or the raw unsigned key words: [2] threefry / [4] rbg)
    derives the epoch's permutation on-device as
    random.permutation(fold_in(key, epoch), N) — one fewer host dispatch per
    epoch, and segments of the same epoch regenerate the identical
    permutation. Any other unsigned array is ambiguous and rejected (an
    explicit uint32 permutation would otherwise be silently replaced with
    derived indices)."""
    if jax.dtypes.issubdtype(perm.dtype, jax.dtypes.prng_key):
        return jax.random.permutation(jax.random.fold_in(perm, epoch),
                                      images_n)
    if jnp.issubdtype(perm.dtype, jnp.unsignedinteger):
        if perm.ndim == 1 and perm.shape[0] in (2, 4):
            return jax.random.permutation(jax.random.fold_in(perm, epoch),
                                          images_n)
        raise TypeError(
            f"`perm` is an unsigned array of shape {perm.shape}, which is "
            "neither a raw PRNG key ((2,) threefry / (4,) rbg words) nor a "
            "typed key; pass explicit permutations as signed integers.")
    return perm


def _reshape_keys(keys, shape):
    """Reshape the LOGICAL leading shape of a per-step key array — typed
    key arrays reshape through key_data/wrap_key_data (the .reshape method
    operates on the raw data shape on this jax), raw uint32 key arrays
    keep their trailing key-words dim."""
    if jax.dtypes.issubdtype(keys.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(keys)
        kd = kd.reshape(tuple(shape) + kd.shape[len(keys.shape):])
        return jax.random.wrap_key_data(kd,
                                        impl=jax.random.key_impl(keys))
    return keys.reshape(tuple(shape) + keys.shape[2:])


def build_segment_runner(builder, use_dp: bool, mean_sample_fn=None,
                         preprocess=None, batch_sharding=None,
                         assume_full_cadence=False, grouped=False,
                         grouped_p=0):
    """One jitted lax.scan over a whole logging interval of batches.

    `assume_full_cadence=True` (caller guarantees g_mask is all-True and
    threshold gating is off, i.e. n_d_steps==1) drops the lax.cond and runs
    the G update unconditionally — TPU conditionals flush the pipeline, a
    measurable per-step cost on launch-bound workloads.

    `grouped=True` (--group_fakes; caller guarantees the cadence contract,
    see _build_grouped_run) restructures the scan around n_d_steps cadence
    groups and generates each group's fresh fakes in ONE batched G forward.
    Only the cadence PHASE of the segment start (`grouped_p` = start %
    n_d_steps, default 0 — every grouped call site loop.py makes) is baked
    statically; `start` itself stays a traced operand, so distinct starts
    with the same phase and length share one compile (a static start would
    recompile the scan-wrapped DCResNet body, ~3 min on the relay, per
    logging cut).

    Returns f(state, rng, images, labels, perm, start, g_mask, mean_samples,
    d_loss_acc, acc_in=None, epoch=0) -> (state, rng, d_metric_sums,
    g_metric_sums, g_count, d_loss_acc).
      - per-step subkeys derive positionally from (rng, epoch, start+i)
        in one batched fold_in outside the scan (see `run`); `rng` is
        returned unchanged as the continuation key.
      - `perm` is either an explicit row-permutation array (signed ints) or
        a PRNG key (see _resolve_perm).
      - `acc_in`, when given, is the (d_sums, g_sums, g_count) tuple from
        the previous segment: metric accumulation across segments then
        happens inside this dispatch instead of a separate combine jit.
      - `mean_samples` may be a dummy scalar when unused; `d_loss_acc` is
        the threshold accumulator carried across segments (pass zeros(())
        when gating is off).
    """
    if grouped:
        run = _build_grouped_run(builder, use_dp, mean_sample_fn, preprocess,
                                 batch_sharding, grouped_p)
        return jax.jit(run, donate_argnums=(0,))
    run = _build_run(builder, use_dp, mean_sample_fn, preprocess,
                     batch_sharding, assume_full_cadence)
    return jax.jit(run, donate_argnums=(0,))


def build_epochs_runner(builder, use_dp: bool, n_epochs: int, n_batches: int,
                        mean_sample_fn=None, preprocess=None,
                        batch_sharding=None, assume_full_cadence=False,
                        grouped=False):
    """`n_epochs` whole epochs of `n_batches` batches in ONE dispatch.

    An outer lax.scan over the epoch index wraps the segment body: each
    epoch derives its own on-device permutation from (perm_key, epoch0+e)
    and runs the same per-batch body as build_segment_runner, with the
    metric sums / rng / threshold accumulator carried straight through —
    so a k-epoch dispatch is bit-identical to k chained per-epoch segment
    dispatches (tests/test_segment_runner.py pins this). Cuts the last
    ~1 ms/epoch of dispatch-issue cost on relay links when the logging
    interval spans multiple epochs (VERDICT round-2 item 2).

    Signature: f(state, rng, images, labels, perm_key, g_mask, mean_samples,
    d_loss_acc, acc_in, epoch0) -> same outputs as the segment runner.
    `g_mask` is ONE epoch's cadence mask ([n_batches]; the reference's
    batch_i % n_d_steps == 0 resets every epoch, train.py:530); `perm_key`
    must be a PRNG key (typed or raw words), not an explicit permutation.
    `grouped` as in build_segment_runner (start is 0 for every epoch here,
    so the cadence contract is automatic when the caller's masks are the
    standard per-epoch cadence).
    """
    if grouped:
        run = _build_grouped_run(builder, use_dp, mean_sample_fn,
                                 preprocess, batch_sharding, 0)
    else:
        run = _build_run(builder, use_dp, mean_sample_fn, preprocess,
                         batch_sharding, assume_full_cadence)

    def run_epochs(state, rng, images, labels, perm_key, g_mask,
                   mean_samples, d_loss_acc, acc_in, epoch0):
        def epoch_body(carry, e):
            state, rng, d_loss_acc, acc = carry
            state, rng, d_sums, g_sums, g_count, d_loss_acc = run(
                state, rng, images, labels, perm_key, 0, g_mask,
                mean_samples, d_loss_acc, acc, e)
            return (state, rng, d_loss_acc, (d_sums, g_sums, g_count)), None

        carry0 = (state, rng, d_loss_acc, acc_in)
        (state, rng, d_loss_acc, (d_sums, g_sums, g_count)), _ = \
            jax.lax.scan(epoch_body, carry0,
                         epoch0 + jnp.arange(n_epochs), length=n_epochs)
        return state, rng, d_sums, g_sums, g_count, d_loss_acc

    return jax.jit(run_epochs, donate_argnums=(0,))


def _build_run(builder, use_dp: bool, mean_sample_fn, preprocess,
               batch_sharding, assume_full_cadence):
    """The un-jitted segment body shared by both runners."""
    bs = builder.opt.batch_size
    use_mean = mean_sample_fn is not None
    need_pen = bool(builder.penalty_types)
    need_adapt = builder.adaptive and use_dp
    threshold = float(builder.opt.train_d_until_threshold)
    use_threshold = threshold < 1e10
    full_cadence = assume_full_cadence and not use_threshold
    n_d = max(1, int(builder.opt.n_d_steps))

    def run(state, rng, images, labels, perm, start, g_mask, mean_samples,
            d_loss_acc, acc_in=None, epoch=0):
        perm = _resolve_perm(perm, images.shape[0], epoch)
        n = g_mask.shape[0]

        # Phase-collapse carry (steps.py use_phase_carry): the fused
        # upsample-conv kernel collapse is a weight-only transform of G
        # params, so the D steps' fresh-fake G forwards can consume a
        # pre-collapsed cache that rides the scan carry; it is recomputed
        # only inside the G-update branch (and once here per dispatch).
        # None when inapplicable — the carry slot is then an empty pytree.
        pcache0 = builder.phase_collapse(state.g_params)

        # Every step's subkeys derive POSITIONALLY, outside the scan, in
        # one batched fold_in: subkey (i, j) = fold_in(fold_in(rng, epoch),
        # (start + i) * 8 + j). The old per-step jax.random.split chains
        # lowered to ~20 standalone sub-microsecond u32 kernels per
        # iteration of the launch-bound MNIST scan (round-3 xplane
        # profile); as scan xs the keys cost one slice. Positional
        # derivation also makes the streams independent of segmentation:
        # chained segments (start offsets), multi-epoch dispatches and one
        # whole-epoch dispatch see identical keys by construction, and
        # `rng` passes through unchanged as the continuation key (epochs
        # stay distinct via the epoch fold).
        # Column layout: 0-2 D-step row (z, noise, pen), 3-4 G-step row
        # (z, y), 5 penalty mean-samples, 6 adaptive mean-samples,
        # 7 poisson/preprocess.
        base = jax.random.fold_in(rng, epoch)
        cols = (start + jnp.arange(n))[:, None] * 8 + jnp.arange(8)[None, :]
        step_keys = jax.vmap(jax.vmap(
            lambda t: jax.random.fold_in(base, t)))(cols)

        def step_core(state, d_acc, i, g_cad, kk, pcache):
            k_dd, k_gg = kk[0:3], kk[3:5]
            k_pen, k_ad, k_pp = kk[5], kk[6], kk[7]
            valid = None
            if use_dp and builder.poisson:
                x, yy, valid = builder.poisson_draw(
                    images, labels, jax.random.fold_in(k_pp, 0x901))
                y = yy if builder.conditional else None
            else:
                idx = jax.lax.dynamic_slice(perm, ((start + i) * bs,),
                                            (bs,))
                x, yy = builder.gather_batch(images, labels, idx)
                y = yy if builder.conditional else None
            if batch_sharding is not None:
                # Shard the gathered batch over the mesh's data axis so
                # the per-sample-grad work actually parallelizes (the
                # dataset itself is replicated).
                x = jax.lax.with_sharding_constraint(x, batch_sharding)
                if y is not None:
                    y = jax.lax.with_sharding_constraint(y, batch_sharding)
            if preprocess is not None:
                x = preprocess(x, k_pp)

            if need_pen and use_mean:
                pen_x, pen_y = mean_sample_fn(mean_samples, k_pen, y,
                                              x.shape[0])
                if not builder.conditional:
                    pen_y = None
            else:
                pen_x, pen_y = x, y
            if need_adapt and use_mean:
                ax, ay = mean_sample_fn(mean_samples, k_ad, None, bs)
                if not builder.conditional:
                    ay = None
            else:
                ax, ay = x, y

            state, dm = builder._d_core(state, x, y, pen_x, pen_y, ax, ay,
                                        k_dd, use_dp, valid, pcache)
            d_acc = d_acc + dm["d_adv_loss"]
            if use_threshold:
                g_on = jnp.logical_and(g_cad, d_acc / n_d < threshold)
            else:
                g_on = g_cad

            def do_g(op):
                st, pc = op
                st, gm = builder._g_step(st, k_gg)
                if pc is not None:
                    pc = builder.phase_collapse(st.g_params)
                return st, gm, pc

            def skip_g(op):
                st, pc = op
                zeros = {"g_adv_loss": jnp.asarray(0.0)}
                if builder.is_acgan:
                    zeros["g_aux_loss"] = jnp.asarray(0.0)
                    zeros["g_aux_acc"] = jnp.asarray(0.0)
                return st, zeros, pc

            if full_cadence:
                # Caller guarantees g_on is always True; skip the
                # conditional (TPU pipeline flush) entirely.
                state, gm, pcache = do_g((state, pcache))
                g_on = jnp.bool_(True)
            else:
                state, gm, pcache = jax.lax.cond(g_on, do_g, skip_g,
                                                 (state, pcache))
            # The accumulator resets at every cadence point, trained or
            # not (reference train.py:533 zeroes it after the decision).
            d_acc = jnp.where(g_cad, 0.0, d_acc)
            return state, d_acc, dm, gm, g_on, pcache

        # Metric SUMS ride the scan carry instead of being stacked into
        # [n]-buffers and summed afterwards: per-step dynamic-update-
        # slices + copies for ~15 stacked metrics were a measurable
        # fraction of the (launch-overhead-bound) MNIST scan body.
        # The structure of one step's metrics comes from eval_shape
        # (trace-time only, no compute).
        dm_s, gm_s = jax.eval_shape(
            lambda s, a, kk: step_core(s, a, jnp.int32(0),
                                       jnp.bool_(True), kk, pcache0)[2:4],
            state, d_loss_acc, step_keys[0])
        zeros = lambda t: jax.tree.map(
            lambda x: jnp.zeros(x.shape, x.dtype), t)
        track_is = builder.dp_mode == "is" and use_dp
        # is_sens is a scalar (flat sensitivity) or an [L] vector
        # (per-param mode) — size the extreme trackers to match.
        sens_shape = dm_s["is_sens"].shape if track_is else ()
        if acc_in is None:
            d0, g0, n0 = zeros(dm_s), zeros(gm_s), jnp.zeros((), jnp.int32)
            s_min0 = jnp.full(sens_shape, jnp.inf) if track_is \
                else jnp.zeros(())
            s_max0 = jnp.full(sens_shape, -jnp.inf) if track_is \
                else jnp.zeros(())
        else:
            # Seed the in-scan accumulators with the previous segment's
            # sums: cross-segment metric accumulation rides this dispatch
            # (no separate combine jit per segment). The extreme-tracked
            # keys popped here MUST stay in sync with the +/-inf seeding
            # in loop.py _zero_scan_acc.
            d0, g0, n0 = acc_in
            d0 = dict(d0)
            s_min0 = d0.pop("is_sens_min", jnp.zeros(()))
            s_max0 = d0.pop("is_sens_max", jnp.zeros(()))
        carry0 = (state, d_loss_acc, d0, g0, n0, s_min0, s_max0, pcache0)

        def body(carry, inp):
            state, d_acc, d_sum, g_sum, g_n, s_min, s_max, pcache = carry
            i, g_cad, kk = inp
            state, d_acc, dm, gm, g_on, pcache = step_core(
                state, d_acc, i, g_cad, kk, pcache)
            d_sum = jax.tree.map(jnp.add, d_sum, dm)
            g_sum = jax.tree.map(jnp.add, g_sum, gm)
            g_n = g_n + g_on.astype(jnp.int32)
            if track_is:
                # True interval extremes for the IS sensitivity log
                # columns (reference train.py:331-338).
                s_min = jnp.minimum(s_min, dm["is_sens"])
                s_max = jnp.maximum(s_max, dm["is_sens"])
            return (state, d_acc, d_sum, g_sum, g_n, s_min,
                    s_max, pcache), None

        (state, d_loss_acc, d_sums, g_sums, g_count, s_min,
         s_max, _), _ = jax.lax.scan(body, carry0,
                                     (jnp.arange(n), g_mask, step_keys))
        state = builder._constrain_state(state)
        if track_is:
            d_sums["is_sens_min"] = s_min
            d_sums["is_sens_max"] = s_max
        return (state, rng, d_sums, g_sums, g_count, d_loss_acc)

    return run


def _build_grouped_run(builder, use_dp: bool, mean_sample_fn, preprocess,
                       batch_sharding, p: int = 0):
    """Cadence-grouped segment body (--group_fakes): one batched fresh-fake
    G forward per n_d_steps cadence group.

    G params can only change at cadence points (reference train.py:530-533
    updates G, threshold-gated, exactly when batch_i % n_d_steps == 0), so
    all D steps between two cadence points see an identical frozen G. This
    body therefore iterates cadence GROUPS instead of batches: per group it
    gathers the group's n_d batches in one row gather, generates their n_d
    fresh fake batches in ONE (n_d*bs)-sized G forward (steps.batch_fakes —
    per-step z keys unchanged, so the z values are identical to the
    per-batch path), runs the n_d D steps over slices, then the
    (threshold-gated, like _build_run) G update. Value-identical per step
    up to conv/GN reduce order in the batched forward
    (tests/test_segment_runner.py pins it).

    Caller contract (loop.py): g_mask equals the standard cadence pattern
    ((start + i) % n_d_steps == 0) — the mask VALUES are not read here,
    only its static length; n_d_steps > 1; no Poisson subsampling
    (variable batch occupancy); BatchNorm-free G (BN batch stats are not
    batch-size-invariant). `start` is a traced operand; the builder bakes
    only its cadence PHASE `p` = start % n_d (the head/group/tail
    decomposition depends on p and the mask length, nothing else) — the
    caller must pass starts consistent with the built p.

    Segment decomposition for a segment of n batches starting at global
    batch index `start` (first cadence point at local (-start) % n_d =
    (-p) % n_d):
      head:  D_0..D_p, then the cadence-point G update  (p+1 steps)
      K = (n-p-1) // n_d full groups: n_d D steps + G update each
      tail:  r = (n-p-1) % n_d trailing D steps (contains no cadence point)
    """
    bs = builder.opt.batch_size
    use_mean = mean_sample_fn is not None
    need_pen = bool(builder.penalty_types)
    need_adapt = builder.adaptive and use_dp
    threshold = float(builder.opt.train_d_until_threshold)
    use_threshold = threshold < 1e10
    n_d = max(1, int(builder.opt.n_d_steps))
    track_is = builder.dp_mode == "is" and use_dp
    if builder.poisson and use_dp:
        raise ValueError("grouped runner does not support --poisson "
                         "(variable batch occupancy); caller must gate")
    if builder.g_has_bn:
        raise ValueError("grouped runner requires a BatchNorm-free G")

    first_cad = (-p) % n_d  # local index of the first cadence point

    def run(state, rng, images, labels, perm, start, g_mask, mean_samples,
            d_loss_acc, acc_in=None, epoch=0):
        perm = _resolve_perm(perm, images.shape[0], epoch)
        n = g_mask.shape[0]
        head = min(first_cad + 1, n)
        K = (n - head) // n_d
        r = (n - head) % n_d

        pcache0 = builder.phase_collapse(state.g_params)

        # Positional per-step subkeys, identical to _build_run.
        base = jax.random.fold_in(rng, epoch)
        cols = (start + jnp.arange(n))[:, None] * 8 + jnp.arange(8)[None, :]
        step_keys = jax.vmap(jax.vmap(
            lambda t: jax.random.fold_in(base, t)))(cols)

        def gather_block(i0, m):
            """m consecutive batches in one row gather; i0 may be traced."""
            idx = jax.lax.dynamic_slice(perm, ((start + i0) * bs,),
                                        (m * bs,))
            x, yy = builder.gather_batch(images, labels, idx)
            return (x.reshape((m, bs) + x.shape[1:]),
                    yy.reshape(m, bs))

        def d_block(state, d_acc, d_sum, s_min, s_max, pcache,
                    X, Y, FAKES, KEYS):
            """The block's D steps (inner scan over its m batches)."""
            def body(carry, inp):
                state, d_acc, d_sum, s_min, s_max = carry
                x, yy, fake, kk = inp
                y = yy if builder.conditional else None
                if batch_sharding is not None:
                    x = jax.lax.with_sharding_constraint(x, batch_sharding)
                    if y is not None:
                        y = jax.lax.with_sharding_constraint(
                            y, batch_sharding)
                    fake = jax.lax.with_sharding_constraint(
                        fake, batch_sharding)
                if preprocess is not None:
                    x = preprocess(x, kk[7])
                if need_pen and use_mean:
                    pen_x, pen_y = mean_sample_fn(mean_samples, kk[5], y,
                                                  x.shape[0])
                    if not builder.conditional:
                        pen_y = None
                else:
                    pen_x, pen_y = x, y
                if need_adapt and use_mean:
                    ax, ay = mean_sample_fn(mean_samples, kk[6], None, bs)
                    if not builder.conditional:
                        ay = None
                else:
                    ax, ay = x, y
                state, dm = builder._d_core(state, x, y, pen_x, pen_y,
                                            ax, ay, kk, use_dp, None,
                                            pcache, fake)
                d_acc = d_acc + dm["d_adv_loss"]
                d_sum = jax.tree.map(jnp.add, d_sum, dm)
                if track_is:
                    s_min = jnp.minimum(s_min, dm["is_sens"])
                    s_max = jnp.maximum(s_max, dm["is_sens"])
                return (state, d_acc, d_sum, s_min, s_max), None

            (state, d_acc, d_sum, s_min, s_max), _ = jax.lax.scan(
                body, (state, d_acc, d_sum, s_min, s_max),
                (X, Y, FAKES, KEYS))
            return state, d_acc, d_sum, s_min, s_max

        def g_boundary(state, pcache, d_acc, kk, g_sum, g_n):
            """Cadence-point G update (threshold-gated like _build_run);
            resets the threshold accumulator unconditionally
            (train.py:533)."""
            k_gg = kk[3:5]

            def do_g(op):
                st, pc = op
                st, gm = builder._g_step(st, k_gg)
                if pc is not None:
                    pc = builder.phase_collapse(st.g_params)
                return st, gm, pc

            def skip_g(op):
                st, pc = op
                zeros = {"g_adv_loss": jnp.asarray(0.0)}
                if builder.is_acgan:
                    zeros["g_aux_loss"] = jnp.asarray(0.0)
                    zeros["g_aux_acc"] = jnp.asarray(0.0)
                return st, zeros, pc

            if use_threshold:
                g_on = d_acc / n_d < threshold
                state, gm, pcache = jax.lax.cond(g_on, do_g, skip_g,
                                                 (state, pcache))
            else:
                state, gm, pcache = do_g((state, pcache))
                g_on = jnp.bool_(True)
            g_sum = jax.tree.map(jnp.add, g_sum, gm)
            g_n = g_n + g_on.astype(jnp.int32)
            return state, pcache, jnp.zeros_like(d_acc), g_sum, g_n

        # Metric-sum templates: D structure from an eval_shape probe of one
        # D step (trace only); G structure is skip_g's zeros by
        # construction (same must-mirror-_g_step contract _build_run's
        # skip branch relies on).
        def _probe(s, kk):
            x, yy = builder.gather_batch(images, labels, jnp.arange(bs))
            y = yy if builder.conditional else None
            if preprocess is not None:
                x = preprocess(x, kk[7])
            _, dm = builder._d_core(s, x, y, x, y, x, y, kk, use_dp,
                                    None, pcache0)
            return dm

        dm_s = jax.eval_shape(_probe, state, step_keys[0])
        zeros = lambda t: jax.tree.map(
            lambda x: jnp.zeros(x.shape, x.dtype), t)
        g_zero = {"g_adv_loss": jnp.zeros(())}
        if builder.is_acgan:
            g_zero["g_aux_loss"] = jnp.zeros(())
            g_zero["g_aux_acc"] = jnp.zeros(())
        sens_shape = dm_s["is_sens"].shape if track_is else ()
        if acc_in is None:
            d_sum, g_sum = zeros(dm_s), g_zero
            g_n = jnp.zeros((), jnp.int32)
            s_min = jnp.full(sens_shape, jnp.inf) if track_is \
                else jnp.zeros(())
            s_max = jnp.full(sens_shape, -jnp.inf) if track_is \
                else jnp.zeros(())
        else:
            d_sum, g_sum, g_n = acc_in
            d_sum = dict(d_sum)
            s_min = d_sum.pop("is_sens_min", jnp.zeros(()))
            s_max = d_sum.pop("is_sens_max", jnp.zeros(()))

        d_acc = d_loss_acc
        pcache = pcache0

        # HEAD: D_0..D_{head-1} under the incoming G params, then the
        # cadence-point G update (if the segment reaches one).
        X, Y = gather_block(0, head)
        head_keys = step_keys[:head]
        FAKES = builder.batch_fakes(
            state, head_keys, Y if builder.conditional else None, pcache)
        state, d_acc, d_sum, s_min, s_max = d_block(
            state, d_acc, d_sum, s_min, s_max, pcache, X, Y, FAKES,
            head_keys)
        if first_cad < n:
            state, pcache, d_acc, g_sum, g_n = g_boundary(
                state, pcache, d_acc, step_keys[head - 1], g_sum, g_n)

        # FULL GROUPS: outer scan over the K cadence groups.
        if K > 0:
            group_keys = _reshape_keys(step_keys[head:head + K * n_d],
                                       (K, n_d, 8))

            def group_body(carry, inp):
                state, d_acc, d_sum, g_sum, g_n, s_min, s_max, pcache = \
                    carry
                k, KEYS = inp
                X, Y = gather_block(head + k * n_d, n_d)
                FAKES = builder.batch_fakes(
                    state, KEYS, Y if builder.conditional else None,
                    pcache)
                state, d_acc, d_sum, s_min, s_max = d_block(
                    state, d_acc, d_sum, s_min, s_max, pcache, X, Y,
                    FAKES, KEYS)
                state, pcache, d_acc, g_sum, g_n = g_boundary(
                    state, pcache, d_acc, KEYS[-1], g_sum, g_n)
                return (state, d_acc, d_sum, g_sum, g_n, s_min, s_max,
                        pcache), None

            carry0 = (state, d_acc, d_sum, g_sum, g_n, s_min, s_max,
                      pcache)
            (state, d_acc, d_sum, g_sum, g_n, s_min, s_max, pcache), _ = \
                jax.lax.scan(group_body, carry0,
                             (jnp.arange(K), group_keys))

        # TAIL: r trailing D steps past the last cadence point.
        if r > 0:
            X, Y = gather_block(head + K * n_d, r)
            tail_keys = step_keys[head + K * n_d:]
            FAKES = builder.batch_fakes(
                state, tail_keys, Y if builder.conditional else None,
                pcache)
            state, d_acc, d_sum, s_min, s_max = d_block(
                state, d_acc, d_sum, s_min, s_max, pcache, X, Y, FAKES,
                tail_keys)

        state = builder._constrain_state(state)
        if track_is:
            d_sum["is_sens_min"] = s_min
            d_sum["is_sens_max"] = s_max
        return (state, rng, d_sum, g_sum, g_n, d_acc)

    return run
