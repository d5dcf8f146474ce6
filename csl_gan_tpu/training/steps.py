"""Jitted GAN+DP train steps — the TPU-native core.

One pure-functional, jit/pjit-compiled step per role replaces the reference's
mutable-hook training runtime (train.py:360-517 plus the Opacus fork):

  - D step, non-private: plain grad of (real + fake + aux + penalty) loss.
  - D step, gc mode: per-sample-clipped real pass + clean fake pass
    (`grad_clip_split` semantics, SURVEY.md §2.1) or combined-pass clipping,
    adaptive/constant flat/per-layer thresholds, public-data penalty grads
    scaled by batch size (train.py:431), Gaussian noise sigma*C, all fused
    into one XLA program.
  - D step, is mode: immediate sensitivity as a nested vjp — the gradient of
    the (optionally per-layer-scaled) parameter-gradient norm w.r.t. the real
    input batch — with noise sigma*sensitivity (train.py:103-107, 457-469).
  - D step, tm/sv modes (experimental): per-coordinate trimmed mean with
    smooth-sensitivity Student-t noise / sign-vote with Gaussian noise over
    materialized per-sample grads.
  - G step: adversarial (+ACGAN aux) loss through a frozen D.

Host-side control flow (n_d_steps, train_d_until_threshold, warmup, logging
cadence) lives in training/loop.py; everything here is shape-static and
jit-safe. Batches may be sharded over a `jax.sharding.Mesh` data axis; the
per-sample-grad sums then become XLA psums over ICI (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from csl_gan_tpu.models import losses
from csl_gan_tpu.ops import grads as gops
from csl_gan_tpu.training import param_order, penalty as penalty_mod
from csl_gan_tpu.options import opt_get


def key_rows(rng, k: int):
    """k per-purpose subkeys from one key via ONE batched positional
    fold_in (subkey j = fold_in(rng, j)) — or an already-derived row of
    >= k keys passed through unchanged (the segment runner precomputes
    every step's row outside its scan; segment_runner.py).

    Replaces jax.random.split(rng, k) inside the per-batch steps: each
    split site lowered to ~4-6 standalone sub-microsecond u32 kernels per
    scan iteration on the launch-bound MNIST segment (round-3 xplane
    profile), while a vmapped fold_in is one fused kernel and a
    runner-supplied row costs only its xs slice. fold_in-derived streams
    are as independent as split-derived ones; no RNG stream is persisted,
    so the stream change is observable only through manual_seed replay."""
    typed = jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key)
    if rng.ndim == (1 if typed else 2):  # already a row of keys
        assert rng.shape[0] >= k, (rng.shape, k)
        return rng
    return jax.vmap(lambda t: jax.random.fold_in(rng, t))(jnp.arange(k))


@struct.dataclass
class TrainState:
    g_params: Any
    g_batch_stats: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    clipping: Any       # f32 scalar or [n_leaves] (gc; adaptive modes update it)
    scaling_vec: Any    # [n_leaves] (is per-layer scaling) or f32 0.0 placeholder


def make_optimizers(opt):
    """Adam pair matching reference train.py:75-77 (L2 weight decay folded
    into the gradient before the Adam moments, like torch's Adam)."""
    g_tx = optax.adam(opt.g_lr, b1=opt.adam_b1, b2=opt.adam_b2)
    wd = opt_get(opt, "weight_decay", 0) or 0
    if wd:
        d_tx = optax.chain(optax.add_decayed_weights(wd),
                           optax.scale_by_adam(b1=opt.adam_b1, b2=opt.adam_b2),
                           optax.scale(-opt.d_lr))
    else:
        d_tx = optax.adam(opt.d_lr, b1=opt.adam_b1, b2=opt.adam_b2)
    # (optax.flatten was measured here and does NOT help: the concat/slice
    # kernels offset the fused per-leaf Adam arithmetic on this backend.)
    return g_tx, d_tx


class TrainStepBuilder:
    """Builds the jitted step functions for a given config + model pair."""

    def __init__(self, opt, G, D, label1_prob: float = 0.5):
        self.opt = opt
        self.G, self.D = G, D
        self.family = G.family
        self.conditional = bool(opt.conditional)
        self.n_classes = opt.n_classes if opt.conditional else 0
        self.arch = opt.conditional_arch
        self.aux_type = opt.aux_loss_type
        self.aux_scalar = opt.aux_loss_scalar
        self.use_aux = bool(opt.use_aux_loss)
        self.d_fake_aux = bool(opt.d_fake_aux_loss)
        self.is_acgan = bool(opt.is_acgan)
        self.latent = opt.g_latent_dim
        self.label1_prob = label1_prob
        self.penalty_types = list(opt.penalty or [])
        self.aux_penalty = bool(opt.aux_penalty)
        self.sigma = opt.sigma
        self.dp_mode = opt.dp_mode
        self.per_layer = bool(opt.use_grad_clip_per_layer)
        self.grad_clip_split = bool(opt.grad_clip_split)
        self.grad_clip_mode = opt.grad_clip_mode or "standard"
        self.adaptive = self.grad_clip_mode.startswith("adaptive")
        self.adaptive_stat = opt.adaptive_stat
        self.adaptive_scalar = opt.adaptive_scalar
        self.chunk = opt_get(opt, "per_sample_chunk", None)
        # --bf16: the models compute in bfloat16 (registry passes dtype);
        # the conv-ghost real pass follows suit with fp32-accumulated norms
        # and a rigor margin on the clip bound (ops/conv_ghost.py).
        self.compute_dtype = jnp.bfloat16 if opt_get(opt, "bf16", False) \
            else None
        # Exact Poisson subsampling (--poisson): per-step Bernoulli(B/N)
        # inclusion over the dataset, gathered into a static [cap] buffer
        # with a validity mask — matches the accountant's sampling assumption
        # exactly (the reference shuffles fixed-size batches; SURVEY.md §2.1
        # caveat). Grad division and noise use the EXPECTED batch size B.
        self.poisson = bool(opt_get(opt, "poisson", False))
        if self.poisson:
            import math
            self.poisson_q = opt.batch_size / opt.train_set_size
            # cap = B + 8*sqrt(B): overflow probability ~1e-15 (binomial
            # tail); never more than the dataset itself (high sampling
            # rates would otherwise gather fewer rows than the mask length).
            self.poisson_cap = min(
                opt.batch_size + int(math.ceil(8.0 * math.sqrt(opt.batch_size))),
                opt.train_set_size)
        self.use_pallas = bool(opt_get(opt, "pallas", False)) and self.chunk is None
        # Set by the Trainer when the device-resident image table is stored
        # flat [N, F] (training/loop.py _setup_device_data): an [N,H,W,1]
        # float32 table gathers rows at 1/128th lane utilization (~420 us for
        # a bs=600 MNIST batch vs 38 us flat — measured on v5e), so f32
        # tables are kept flat and rows are unflattened after the gather.
        self.img_shape = None
        self.labels_in_table = False  # set by loop._setup_device_data
        self.onehot_in_table = False  # table rows are [x | one-hot | label]
        self.is_per_param = bool(opt.imm_sens_per_param)
        self.is_scaling_mode = opt.imm_sens_scaling_mode or "standard"
        self.moving_avg_beta = opt_get(opt, "moving_avg_beta", 0.9)
        self.steps_per_epoch = max(1, opt.train_set_size // opt.batch_size)
        # tm/sv knobs (reference train.py:118-133; its min/max swap un-swapped)
        self.use_bpc = bool(opt_get(opt, "backprop_clip", False))
        self.bpc_g = bool(opt_get(opt, "bpc_during_g_train", True))
        self.tm_m = opt_get(opt, "tm_m", 10)
        lo, hi = opt_get(opt, "tm_min_val", -1), opt_get(opt, "tm_max_val", 1)
        self.tm_min_val, self.tm_max_val = min(lo, hi), max(lo, hi)
        self.smooth_sens_t = opt_get(opt, "smooth_sens_t", 0.01)
        self.rho_per_step = opt_get(opt, "tm_rho_per_epoch", 10) / self.steps_per_epoch

        self.g_tx, self.d_tx = make_optimizers(opt)
        self.g_has_bn = None  # resolved in init_state
        # Ghost clipping (ops/ghost.py): analytic per-sample norms + matmul
        # sums for the all-Dense vanilla D — no [B, params] materialization.
        from csl_gan_tpu.models.mnist import MNISTVanillaD
        self.use_ghost = (isinstance(D, MNISTVanillaD)
                          and self.dp_mode == "gc" and self.grad_clip_split
                          and not self.use_bpc and self.chunk is None)
        # Conv ghost clipping (ops/conv_ghost.py): analytic per-sample norms
        # (mixed im2col ghost/direct order) + per-layer weighted backward
        # with clip-scaled cotangents — no [B, params] materialization and
        # no per-sample backward at all. Covers flat AND per-layer clipping
        # for the DCResNet D's private real pass.
        from csl_gan_tpu.models.dcresnet import DCResNetDiscriminator
        self.use_conv_ghost = (isinstance(D, DCResNetDiscriminator)
                               and bool(opt_get(opt, "conv_ghost", True))
                               and self.dp_mode == "gc" and self.grad_clip_split
                               and not self.use_bpc and self.chunk is None)
        # Conv models with flat clipping: norms-only pass + single weighted
        # backward (no per-sample-grad re-read; ~12% faster and lower peak
        # memory than the one-pass path on the CelebA D). Fallback when the
        # conv ghost path is disabled (--conv_ghost false).
        # (bf16 excluded: the two-pass weighted backward would round the
        # SUMMED gradient to bf16, breaking the clip bound at the sum's
        # magnitude; the generic one-pass path materializes fp32 per-sample
        # grads and sums them fp32, which stays rigorous.)
        self.use_two_pass = (not self.use_ghost and not self.use_conv_ghost
                             and self.family == "wgan"
                             and self.dp_mode == "gc" and not self.per_layer
                             and self.chunk is None and not self.use_bpc
                             and self.compute_dtype is None)
        # Phase-collapse carry (--phase_carry): the fused upsample-conv's
        # weight-only kernel collapse (models/dcresnet.py
        # collapse_phase_kernel) re-runs inside every D step's fresh-fake
        # G forward although G params change only on G updates. The segment
        # runner carries collapse_phase_kernels(g_params) across D steps and
        # recomputes it inside the G-update cond; _fake_images feeds it to
        # _PhaseConv via the "phase_cache" collection. ref_pixel_shuffle
        # mode has no phase convs (the cache walker returns {}).
        from csl_gan_tpu.models.dcresnet import DCResNetGenerator
        self.use_phase_carry = (isinstance(G, DCResNetGenerator)
                                and not getattr(G, "ref_ps", False)
                                and bool(opt_get(opt, "phase_carry", True)))
        # Per-call-site gn4 policy (--phase_gn4_max_f): the raw-4F
        # GroupNorm's BACKWARD is a measured cost on wide blocks while its
        # forward is a win, and the D-step fake path / sampling never run
        # the G backward — so forward-only call sites always use the
        # all-blocks layout and the cutoff shapes only the G update
        # (RESULTS.md round-4 gn4 policy data). Same params either way
        # (the layout choice is compute-only), so the two module variants
        # share one param tree.
        self.G_fwd = G
        if (isinstance(G, DCResNetGenerator)
                and getattr(G, "phase_gn4_max_f", -1) >= 0):
            self.G_fwd = G.clone(phase_gn4_max_f=-1)

        # Installed by the Trainer under --fsdp (parallel/mesh.py
        # MeshContext.constrain_state): pins each jitted step's output
        # TrainState to the ZeRO-3 leaf shardings so GSPMD keeps params and
        # Adam moments sharded across steps. Identity otherwise. Read at
        # trace time (first call), so installing it after construction but
        # before the first step is safe.
        self._constrain_state = lambda s: s

        # jitted entry points
        self.d_step_plain = jax.jit(self._with_state_out(self._d_step_plain),
                                    donate_argnums=(0,))
        self.g_step = jax.jit(self._with_state_out(self._g_step),
                              donate_argnums=(0,))
        dp = {"gc": self._d_step_gc, "is": self._d_step_is,
              "tm": self._d_step_tmsv, "sv": self._d_step_tmsv}.get(self.dp_mode)
        self.d_step_dp = jax.jit(self._with_state_out(dp),
                                 donate_argnums=(0,)) if dp else None

    def _with_state_out(self, fn):
        def wrapped(state, *a):
            new_state, metrics = fn(state, *a)
            return self._constrain_state(new_state), metrics
        return wrapped

    # ---------------- state ----------------

    def init_state(self, G_vars, D_vars) -> TrainState:
        self.g_has_bn = "batch_stats" in G_vars
        if self.use_phase_carry:
            # Guard against the carry silently disabling (ADVICE r4): a
            # DCResNet G in phase mode must yield phase convs from the
            # walker; an empty cache here means a param-tree shape the
            # walker does not recognize — fail loudly, not slowly.
            from csl_gan_tpu.models.dcresnet import collapse_phase_kernels
            if not collapse_phase_kernels(G_vars["params"]):
                raise ValueError(
                    "--phase_carry is enabled but no fused upsample-conv "
                    "kernels were found in the generator param tree; the "
                    "phase-collapse cache would silently disable. Pass "
                    "--phase_carry false or report the tree layout.")
        d_params = D_vars["params"]
        n_leaves = len(jax.tree_util.tree_leaves(d_params))

        if self.per_layer:
            cpl = self._per_layer_vector(
                d_params, n_leaves, "clipping_param_per_layer", "-cpl",
                "cpl_user_set", param_order.default_clipping_per_layer,
                fallback=[1.0] * n_leaves)
            clipping = jnp.asarray(cpl, jnp.float32)
        else:
            clipping = jnp.asarray(float(self.opt.clipping_param or 1.0), jnp.float32)

        if self.is_scaling_mode != "standard":
            sv = self._per_layer_vector(
                d_params, n_leaves, "imm_sens_scaling_vec", "-issv",
                "issv_user_set", param_order.default_is_scaling_per_layer,
                fallback=[1.0] * n_leaves)
            scaling_vec = jnp.asarray(sv, jnp.float32)
        else:
            scaling_vec = jnp.asarray(0.0, jnp.float32)

        return TrainState(
            g_params=G_vars["params"],
            g_batch_stats=G_vars.get("batch_stats", {}),
            d_params=d_params,
            g_opt_state=self.g_tx.init(G_vars["params"]),
            d_opt_state=self.d_tx.init(d_params),
            clipping=clipping,
            scaling_vec=scaling_vec,
        )

    def _per_layer_vector(self, d_params, n_leaves, flag, cli, user_set_flag,
                          default_builder, fallback):
        """Resolve a torch-order per-layer CLI vector into leaf order.

        The reference's positional CelebA defaults fit only the 9-leaf
        unconditional 64px D (reference options.py:79-80); when the stored
        default mis-fits the actual model (conditional aux head, 48px), it
        is rebuilt structure-aware (param_order.default_*). A USER-provided
        vector of the wrong length is a config error, reported with the flag
        name and the expected torch-order parameter list (the reference
        crashes mid-step with an opaque index error instead).
        """
        vec = opt_get(self.opt, flag, None)
        if vec is None:
            return fallback
        user_set = opt_get(self.opt, user_set_flag, None)
        if user_set is None:
            # Legacy opt.txt without the marker: treat the known dataset
            # default as non-user-set.
            from csl_gan_tpu.options import CELEBA_DEFAULTS
            user_set = list(vec) != list(CELEBA_DEFAULTS.get(flag, []))
        if not user_set:
            # Always rebuild the dataset default by role: on the 48px
            # conditional D the positional vector happens to have the right
            # LENGTH (9) but maps head entries onto convs.
            return default_builder(d_params)
        if len(vec) != n_leaves:
            names = ", ".join(param_order.torch_order_names(d_params))
            raise ValueError(
                f"--{flag} ({cli}) has {len(vec)} entries but the "
                f"discriminator has {n_leaves} parameters; expected one "
                f"entry per parameter in torch order: [{names}]")
        return param_order.from_torch_order(vec, d_params)

    def reset_optimizers(self, state: TrainState) -> TrainState:
        """Fresh Adam state (reference re-inits optimizers post-warmup,
        train.py:572)."""
        return state.replace(g_opt_state=self.g_tx.init(state.g_params),
                             d_opt_state=self.d_tx.init(state.d_params))

    # ---------------- small helpers ----------------

    def _d_apply(self, d_params, x, y, aux=True, bpc=False):
        kwargs = {"aux": aux}
        if self.use_bpc:
            # Only the vanilla D accepts the bpc flag (reference
            # backprop_clip.py supports only the MNIST vanilla model).
            kwargs["bpc"] = bpc
        return self.D.apply({"params": d_params}, x,
                            y if self.conditional else None, **kwargs)

    def _fake_images(self, state: TrainState, z, y, phase_cache=None):
        variables = {"params": state.g_params}
        if phase_cache:
            # Pre-collapsed phase kernels from the segment-scan carry (see
            # use_phase_carry). Safe here because the fakes are
            # stop_gradient'd — no grads flow to the G kernels.
            variables["phase_cache"] = phase_cache
        if self.g_has_bn:
            variables["batch_stats"] = state.g_batch_stats
            img, upd = self.G_fwd.apply(variables, z, y, train=True,
                                        mutable=["batch_stats"])
            return jax.lax.stop_gradient(img), upd["batch_stats"]
        img = self.G_fwd.apply(variables, z, y, train=True)
        return jax.lax.stop_gradient(img), state.g_batch_stats

    def phase_collapse(self, g_params):
        """The "phase_cache" collection for the current G params, or None
        when the carry is inapplicable/disabled (see use_phase_carry)."""
        if not self.use_phase_carry:
            return None
        from csl_gan_tpu.models.dcresnet import collapse_phase_kernels
        return collapse_phase_kernels(g_params) or None

    def batch_fakes(self, state: TrainState, step_key_rows, y_steps,
                    phase_cache=None):
        """Fresh fakes for m consecutive D steps in ONE G forward
        (--group_fakes): G params can only change at n_d_steps cadence
        points (reference train.py:530), so the m steps of a cadence group
        all see an identical frozen G — their m bs-sized fake batches run
        as one m*bs forward, amortizing the small-spatial-stage launch and
        fusion overheads the per-step bs=128 forward pays every D step.

        `step_key_rows`: [m, >=1] per-step key rows (column 0 is each
        step's z key, exactly as key_rows hands it to the D step, so the z
        VALUES are unchanged). `y_steps`: [m, bs] labels or None. Returns
        fakes [m, bs, ...]: slice j equals the per-step
        _fake_images(state, gen_z(row_j[0], bs), y_steps[j]) — per-sample
        math (convs, per-sample GroupNorm) is batch-size-invariant, so
        the values match to reduce-order tolerance (pinned by
        tests/test_segment_runner.py). Requires a BatchNorm-free G (BN
        batch stats are not batch-size-invariant; callers gate on
        g_has_bn)."""
        assert not self.g_has_bn, "batch_fakes requires a BatchNorm-free G"
        bs = self.opt.batch_size if y_steps is None else y_steps.shape[1]
        m = step_key_rows.shape[0]
        z = jax.vmap(lambda kk: self.gen_z(kk[0], bs))(step_key_rows)
        zf = z.reshape(m * bs, z.shape[-1])
        yf = None if y_steps is None else y_steps.reshape(m * bs)
        fakes, _ = self._fake_images(state, zf, yf, phase_cache)
        return fakes.reshape((m, bs) + fakes.shape[1:])

    def gen_z(self, key, size):
        return jax.random.normal(key, (size, self.latent))

    def gen_y(self, key, size):
        """Label sampling (reference train.py:153-161; the binary branch's
        intent Bernoulli(p_true) rather than its int-compare quirk)."""
        if not self.conditional:
            return None
        if self.n_classes < 3:
            return jax.random.bernoulli(key, self.label1_prob, (size,)).astype(jnp.int32)
        return jax.random.randint(key, (size,), 0, self.n_classes)

    def _row_weights(self, y, valid=None):
        """Per-row 1/count-of-own-class, for the ACGAN-wasserstein aux loss's
        cross-sample normalization under per-sample vmap. With a Poisson
        validity mask, counts run over the valid rows only."""
        if not (self.use_aux and self.aux_type == "wasserstein"):
            return None
        onehot = jax.nn.one_hot(y, self.n_classes)
        if valid is not None:
            onehot = onehot * valid[:, None]
        counts = jnp.sum(onehot, axis=0)
        # one-hot dot == counts[y] exactly (single nonzero term); avoids a
        # latency-bound TPU gather (see models/losses.py softmax CE note).
        return 1.0 / jnp.maximum(onehot @ counts, 1.0)

    def _aux_single(self, aux_out_row, yi, wi, fake: bool):
        """Aux loss of ONE sample (aux_out_row: [n_classes])."""
        if not self.use_aux or aux_out_row is None:
            return 0.0
        if self.arch == "WCGAN":
            return 0.0
        if self.aux_type == "cross_entropy":
            logp = jax.nn.log_softmax(aux_out_row)
            # one-hot dot == logp[yi] exactly; under vmap the integer pick
            # becomes a [B, C] take_along gather whose jvp/transpose pair is
            # latency-bound on TPU (see models/losses.py softmax CE note).
            pick = jnp.sum(jax.nn.one_hot(yi, self.n_classes,
                                          dtype=logp.dtype) * logp)
            return -self.aux_scalar * pick
        sign = jax.nn.one_hot(yi, self.n_classes) * (-2.0) + 1.0
        return self.aux_scalar * jnp.sum(sign * jax.nn.sigmoid(aux_out_row)) * wi

    def _aux_batch(self, aux_out, y, fake: bool, reduction="mean"):
        if not self.use_aux or aux_out is None:
            return jnp.asarray(0.0) if reduction == "mean" else 0.0
        if fake and self.arch == "WCGAN":
            return jnp.asarray(0.0) if reduction == "mean" else 0.0
        return losses.aux_loss(self.arch, self.aux_type, self.aux_scalar,
                               aux_out, y, self.n_classes, fake=fake,
                               reduction=reduction)

    def _penalty_grads(self, d_params, pen_x, pen_y, fake_img, y_f, key):
        def pen_fn(p):
            return penalty_mod.calc_penalty(
                self._d_apply, p, self.penalty_types, pen_x, pen_y,
                fake_img, y_f, key, aux_penalty=self.aux_penalty,
                n_classes=self.n_classes)
        return jax.value_and_grad(pen_fn)(d_params)

    # ---------------- metrics ----------------

    def _d_metrics(self, real_out, fake_out, real_loss, fake_loss,
                   real_aux_out, y, real_aux_loss, pen_value, valid=None):
        if valid is None:
            def vmean(t):
                return jnp.mean(t.astype(jnp.float32))
        else:
            count = jnp.maximum(jnp.sum(valid), 1.0)

            def vmean(t):
                return jnp.sum(valid * t.reshape(valid.shape[0], -1).mean(-1)
                               .astype(jnp.float32)) / count

        m = {
            "d_adv_loss": real_loss + fake_loss,
            "d_real_loss": real_loss,
            "d_fake_loss": fake_loss,
            "d_real_acc": 100.0 * vmean(real_out > 0),
            "d_fake_acc": 100.0 * vmean(fake_out < 0),
        }
        if self.use_aux:
            m["d_real_aux_loss"] = real_aux_loss
            if real_aux_out is not None:
                m["d_real_aux_acc"] = 100.0 * vmean(
                    jnp.argmax(real_aux_out, axis=1) == y)
            else:
                m["d_real_aux_acc"] = jnp.asarray(0.0)
        if self.penalty_types:
            m["penalty"] = pen_value
        return m

    # ---------------- D step: non-private ----------------

    def _d_step_plain(self, state: TrainState, x, y, pen_x, pen_y, rng,
                      phase_cache=None, fake_img=None):
        b = x.shape[0]
        ks = key_rows(rng, 2)
        k_z, k_pen = ks[0], ks[1]
        if fake_img is None:
            z = self.gen_z(k_z, b)
            fake_img, g_stats = self._fake_images(state, z, y, phase_cache)
        else:
            # Supplied by the grouped runner (batch_fakes) — same values,
            # generated in one whole-cadence-group G forward.
            g_stats = state.g_batch_stats
        row_w = self._row_weights(y) if self.conditional else None

        def loss_fn(d_params):
            f_out, f_aux = self._d_apply(d_params, fake_img, y,
                                         aux=self.d_fake_aux)
            r_out, r_aux = self._d_apply(d_params, x, y)
            f_loss = losses.d_fake_loss(self.family, f_out)
            r_loss = losses.d_real_loss(self.family, r_out)
            f_aux_loss = self._aux_batch(f_aux, y, fake=True) \
                if self.d_fake_aux else jnp.asarray(0.0)
            r_aux_loss = self._aux_batch(r_aux, y, fake=False)
            total = r_loss + f_loss + r_aux_loss + f_aux_loss
            pen_value = jnp.asarray(0.0)
            if self.penalty_types:
                pen_value = penalty_mod.calc_penalty(
                    self._d_apply, d_params, self.penalty_types, pen_x, pen_y,
                    fake_img, y, k_pen, aux_penalty=self.aux_penalty,
                    n_classes=self.n_classes)
                total = total + pen_value
            return total, (r_out, f_out, r_loss, f_loss, r_aux, r_aux_loss, pen_value)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
        r_out, f_out, r_loss, f_loss, r_aux, r_aux_loss, pen_value = aux
        updates, d_opt = self.d_tx.update(grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        metrics = self._d_metrics(r_out, f_out, r_loss, f_loss, r_aux, y,
                                  r_aux_loss, pen_value)
        return state.replace(d_params=d_params, d_opt_state=d_opt,
                             g_batch_stats=g_stats), metrics

    # ---------------- D step: gradient-clipping DP ----------------

    def _ps_penalty_one(self, d_params, xi, yi, fi, ki):
        """Per-sample gradient penalty on one (real, fake) pair — the
        reference's per-sample penalty path (train.py:438-450), folded into
        the per-sample loss so clipping provably covers it."""
        yy = None if yi is None else yi[None]
        return penalty_mod.calc_penalty(
            self._d_apply, d_params, self.penalty_types, xi[None], yy,
            fi[None], yy, ki, aux_penalty=self.aux_penalty,
            n_classes=self.n_classes)

    def _real_ps_args(self, x, y, row_w, fake_img=None, pen_keys=None):
        """(loss_fn, batch_args) for the per-sample REAL pass.

        With `pen_keys` set (per-sample-penalty mode), each sample's loss
        includes its own gradient penalty so the clip bounds it too.
        """
        with_pen = pen_keys is not None
        if self.conditional:
            w = row_w if row_w is not None else jnp.ones(x.shape[0])

            if with_pen:
                def f(d_params, xi, yi, wi, fi, ki):
                    out, aux_o = self._d_apply(d_params, xi[None], yi[None],
                                               bpc=True)
                    l = losses.d_real_loss(self.family, out, "none")[0]
                    l = l + self._aux_single(
                        None if aux_o is None else aux_o[0], yi, wi, fake=False)
                    return l + self._ps_penalty_one(d_params, xi, yi, fi, ki)

                return f, (x, y, w, fake_img, pen_keys)

            def f(d_params, xi, yi, wi):
                out, aux_o = self._d_apply(d_params, xi[None], yi[None], bpc=True)
                l = losses.d_real_loss(self.family, out, "none")[0]
                return l + self._aux_single(
                    None if aux_o is None else aux_o[0], yi, wi, fake=False)

            return f, (x, y, w)

        if with_pen:
            def f(d_params, xi, fi, ki):
                out, _ = self._d_apply(d_params, xi[None], None, bpc=True)
                return losses.d_real_loss(self.family, out, "none")[0] \
                    + self._ps_penalty_one(d_params, xi, None, fi, ki)

            return f, (x, fake_img, pen_keys)

        def f(d_params, xi):
            out, _ = self._d_apply(d_params, xi[None], None, bpc=True)
            return losses.d_real_loss(self.family, out, "none")[0]

        return f, (x,)

    def _combined_ps_args(self, x, y, fake_img, row_w, pen_keys=None):
        """(loss_fn, batch_args) for real+fake combined per-sample clipping
        (grad_clip_split=False / accum_passes semantics)."""
        with_pen = pen_keys is not None
        if self.conditional:
            w = row_w if row_w is not None else jnp.ones(x.shape[0])

            def f(d_params, xi, yi, fi, wi, *pen):
                r_out, r_aux = self._d_apply(d_params, xi[None], yi[None], bpc=True)
                f_out, f_aux = self._d_apply(d_params, fi[None], yi[None],
                                             aux=self.d_fake_aux, bpc=True)
                l = losses.d_real_loss(self.family, r_out, "none")[0] \
                    + losses.d_fake_loss(self.family, f_out, "none")[0]
                l = l + self._aux_single(None if r_aux is None else r_aux[0],
                                         yi, wi, fake=False)
                if self.d_fake_aux:
                    l = l + self._aux_single(None if f_aux is None else f_aux[0],
                                             yi, wi, fake=True)
                if pen:
                    l = l + self._ps_penalty_one(d_params, xi, yi, fi, pen[0])
                return l

            args = (x, y, fake_img, w) + ((pen_keys,) if with_pen else ())
            return f, args

        def f(d_params, xi, fi, *pen):
            r_out, _ = self._d_apply(d_params, xi[None], None, bpc=True)
            f_out, _ = self._d_apply(d_params, fi[None], None, bpc=True)
            l = losses.d_real_loss(self.family, r_out, "none")[0] \
                + losses.d_fake_loss(self.family, f_out, "none")[0]
            if pen:
                l = l + self._ps_penalty_one(d_params, xi, None, fi, pen[0])
            return l

        return f, (x, fake_img) + ((pen_keys,) if with_pen else ())

    def poisson_draw(self, images, labels, key):
        """One exact Poisson draw: Bernoulli(B/N) inclusion over the dataset,
        included rows packed (stable argsort) into the static [cap] buffer,
        plus the validity mask. The SINGLE implementation used by both the
        host loop and the interval scan (privacy-critical: they must sample
        identically)."""
        incl = jax.random.bernoulli(key, self.poisson_q, (images.shape[0],))
        order = jnp.argsort(jnp.logical_not(incl), stable=True)
        idx = order[:self.poisson_cap]
        count = jnp.sum(incl.astype(jnp.int32))
        valid = (jnp.arange(self.poisson_cap) < count).astype(jnp.float32)
        x, yy = self.gather_batch(images, labels, idx)
        return x, yy, valid

    def gather_batch(self, images, labels, idx):
        """Gather one batch of (x, y) by row indices.

        With labels_in_table (loop._setup_device_data packs the label as a
        trailing f32 column of the flat image table), ONE row gather serves
        both: the separate labels[idx] gather measured 4.5 us/step on the
        launch-bound MNIST scan (a [600] s32 pick lowers as a latency-bound
        custom fusion), while the extra column is free — the 784-wide f32
        rows pad to the same 896-lane tile either way. The pixel slice
        fuses into its consumers (the MLP flattens right back, so XLA
        cancels the unflatten reshape), and the label column read is a
        tiny strided fusion."""
        if self.labels_in_table:
            rows = images[idx]
            u8 = rows.dtype == jnp.uint8
            if rows.dtype != jnp.float32:
                # --bf16_table / --u8_table storage: the gather moves
                # half / a quarter of the f32 bytes; converting right here
                # keeps every downstream consumer (models, ghost norms, DP
                # clipping) in exact fp32 arithmetic on the stored values.
                rows = rows.astype(jnp.float32)
            f = 1
            for d in self.img_shape:
                f *= d
            # Rows may carry extra one-hot columns between the pixels and
            # the trailing label (onehot_in_table; consumed by the Pallas
            # epoch runner) — slice by image width, not by :-1.
            x = rows[:, :f]
            if u8:
                # Dequantize with the loader's own math (u8 -> f32, /255;
                # data/mnist.py:128) so u8-derived pixels round-trip
                # bit-exactly (tests/test_segment_runner.py).
                x = x / 255.0
            x = x.reshape((rows.shape[0],) + tuple(self.img_shape))
            return x, rows[:, -1].astype(jnp.int32)
        x = self.unflatten_rows(images[idx])
        if x.dtype == jnp.bfloat16:
            x = x.astype(jnp.float32)
        return x, labels[idx]

    def unflatten_rows(self, x):
        """Restore [B, *img_shape] after a row gather from a flat-stored
        [N, F] device image table (see img_shape in __init__); identity for
        tables kept in their natural layout."""
        if x.ndim == 2 and self.img_shape is not None:
            return x.reshape((x.shape[0],) + tuple(self.img_shape))
        return x

    @staticmethod
    def _mask_loss(f, args, valid):
        """Multiply the per-sample loss by a validity weight: masked rows get
        exactly zero gradient, so the clipped sum runs over valid rows only
        (Poisson subsampling)."""
        if valid is None:
            return f, args

        def masked(d_params, vi, *ex):
            return vi * f(d_params, *ex)

        return masked, (valid,) + args

    def _adaptive_clipping(self, d_params, ax, ay):
        """New clip thresholds from public/mean-batch per-sample grad norms
        (reference train.py:204-245; real-pass only, the grad_clip_split
        default)."""
        row_w = self._row_weights(ay) if self.conditional else None
        if self.use_conv_ghost:
            # Analytic norms — no per-sample-grad materialization for the
            # adaptive statistic either.
            from csl_gan_tpu.ops import conv_ghost
            concat = (self.conditional and self.arch != "ACGAN"
                      and opt_get(self.opt, "d_label_emb_mode",
                                  "concat") == "concat")
            norms = conv_ghost.dcresnet_real_ghost(
                d_params, ax, ay, n_classes=self.n_classes, arch=self.arch,
                aux_type=self.aux_type, aux_scalar=self.aux_scalar,
                row_w=row_w, concat_planes=concat, max_norm=1.0,
                per_layer=self.per_layer,
                compute_dtype=self.compute_dtype, norms_only=True)
        else:
            f, args = self._real_ps_args(ax, ay, row_w)
            ps = gops.per_sample_grads(f, d_params, *args, chunk=self.chunk)
            norms = gops._leaf_norms(ps)  # [L, B]
        stat = jnp.mean(norms, axis=1) if self.adaptive_stat == "mean" \
            else jnp.max(norms, axis=1)
        if self.per_layer:
            return stat * self.adaptive_scalar
        return jnp.sqrt(jnp.sum(stat ** 2)) * self.adaptive_scalar

    def _d_step_gc(self, state: TrainState, x, y, pen_x, pen_y, ax, ay, rng,
                   valid=None, phase_cache=None, fake_img=None):
        b = x.shape[0]
        # Under Poisson subsampling (valid mask set), division and penalty
        # scaling use the EXPECTED batch size (standard Poisson DP-SGD).
        b_eff = self.opt.batch_size if valid is not None else b
        ks = key_rows(rng, 3)
        k_z, k_noise, k_pen = ks[0], ks[1], ks[2]
        if fake_img is None:
            z = self.gen_z(k_z, b)
            fake_img, g_stats = self._fake_images(state, z, y, phase_cache)
        else:
            g_stats = state.g_batch_stats
        row_w = self._row_weights(y, valid) if self.conditional else None

        clipping = state.clipping
        if self.adaptive:
            clipping = self._adaptive_clipping(state.d_params, ax, ay)

        # Fused Pallas clip+noise path (TPU, unchunked): DP noise is
        # generated inside the weighted-sum kernel; addition commutes with
        # the fake-pass/penalty grads added below.
        fused = (k_noise, self.sigma) if (
            self.use_pallas and jax.default_backend() == "tpu") else None

        # Per-sample penalty mode (penalty on sensitive data, no public
        # surrogate): fold each sample's penalty into its per-sample loss so
        # the clip bounds it (reference train.py:438-450 semantics).
        ps_pen = bool(self.penalty_types) and not self.opt.penalty_use_public_data
        pen_keys = jax.random.split(k_pen, b) if ps_pen else None

        noise_done = False
        ghost_outs = None
        if self.grad_clip_split:
            # Private real pass: per-sample clip; clean fake pass: sum grads.
            if self.use_ghost and not ps_pen:
                from csl_gan_tpu.ops import ghost
                y_onehot = (jax.nn.one_hot(y, self.n_classes)
                            if self.conditional else None)
                aux_labels = y if (self.conditional and self.use_aux) else None
                summed, clip_stats, ghost_outs = ghost.vanilla_real_ghost(
                    state.d_params, x, y_onehot, aux_labels, self.aux_scalar,
                    clipping, self.per_layer, valid=valid,
                    noise=(k_noise, self.sigma))
                noise_done = True
            elif self.use_conv_ghost and not ps_pen:
                from csl_gan_tpu.ops import conv_ghost
                concat = (self.conditional and self.arch != "ACGAN"
                          and opt_get(self.opt, "d_label_emb_mode",
                                      "concat") == "concat")
                summed, clip_stats, ghost_outs = conv_ghost.dcresnet_real_ghost(
                    state.d_params, x, y, n_classes=self.n_classes,
                    arch=self.arch, aux_type=self.aux_type,
                    aux_scalar=self.aux_scalar, row_w=row_w,
                    concat_planes=concat, max_norm=clipping,
                    per_layer=self.per_layer,
                    compute_dtype=self.compute_dtype, valid=valid,
                    noise=(k_noise, self.sigma))
                noise_done = True
            elif self.use_two_pass and not ps_pen:
                f, args = self._real_ps_args(x, y, row_w)
                f, args = self._mask_loss(f, args, valid)
                summed, clip_stats = gops.two_pass_clipped_grad_sum(
                    f, state.d_params, *args, max_norm=clipping,
                    per_layer=False)
            else:
                f, args = self._real_ps_args(x, y, row_w, fake_img, pen_keys)
                f, args = self._mask_loss(f, args, valid)
                summed, clip_stats = gops.clipped_grad_sum(
                    f, state.d_params, *args, max_norm=clipping,
                    per_layer=self.per_layer, chunk=self.chunk,
                    fused_noise=fused)
                noise_done = fused is not None

            def fake_sum(d_params):
                out, aux_o = self._d_apply(d_params, fake_img, y,
                                           aux=self.d_fake_aux, bpc=True)
                per = losses.d_fake_loss(self.family, out, "none")
                if valid is not None:
                    per = per * valid
                l = jnp.sum(per)
                if self.d_fake_aux and self.use_aux:
                    pa = self._aux_batch(aux_o, y, fake=True, reduction="none")
                    if valid is not None:
                        pa = pa * valid
                    l = l + jnp.sum(pa)
                return l, (out, aux_o)

            (_, (f_out, _f_aux)), fake_grads = jax.value_and_grad(
                fake_sum, has_aux=True)(state.d_params)
            total = jax.tree.map(jnp.add, summed, fake_grads)
        else:
            f, args = self._combined_ps_args(x, y, fake_img, row_w, pen_keys)
            f, args = self._mask_loss(f, args, valid)
            total, clip_stats = gops.clipped_grad_sum(
                f, state.d_params, *args, max_norm=clipping,
                per_layer=self.per_layer, chunk=self.chunk, fused_noise=fused)
            noise_done = fused is not None
            f_out, _ = self._d_apply(state.d_params, fake_img, y,
                                     aux=False)

        pen_value = jnp.asarray(0.0)
        if self.penalty_types and ps_pen:
            # Already clipped inside the per-sample losses; recompute the
            # batch value once for logging only.
            pen_value = penalty_mod.calc_penalty(
                self._d_apply, state.d_params, self.penalty_types, pen_x,
                pen_y, fake_img, y, k_pen, aux_penalty=self.aux_penalty,
                n_classes=self.n_classes)
        elif self.penalty_types:
            # Public/mean-sample penalty: plain grad added to the summed grads
            # scaled by batch size (train.py:423-431).
            pen_value, pen_grads = self._penalty_grads(
                state.d_params, pen_x, pen_y, fake_img, y, k_pen)
            total = jax.tree.map(lambda t, g: t + g * b_eff, total, pen_grads)

        if not noise_done:
            total = gops.add_gaussian_noise(k_noise, total, self.sigma,
                                            clipping, per_layer=self.per_layer)
        grads = jax.tree.map(lambda t: t / b_eff, total)

        updates, d_opt = self.d_tx.update(grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)

        # Metrics forward (real pass outputs for logging; ghost path already
        # produced them).
        if self.grad_clip_split and ghost_outs is not None:
            r_out, r_aux = ghost_outs
        else:
            r_out, r_aux = self._d_apply(state.d_params, x, y)
        if valid is not None:
            count = jnp.maximum(jnp.sum(valid), 1.0)
            r_loss = jnp.sum(
                valid * losses.d_real_loss(self.family, r_out, "none")) / count
            f_loss = jnp.sum(
                valid * losses.d_fake_loss(self.family, f_out, "none")) / count
            r_aux_loss = jnp.sum(
                valid * self._aux_batch(r_aux, y, fake=False,
                                        reduction="none")) / count \
                if self.use_aux else jnp.asarray(0.0)
        else:
            r_loss = losses.d_real_loss(self.family, r_out)
            f_loss = losses.d_fake_loss(self.family, f_out)
            r_aux_loss = self._aux_batch(r_aux, y, fake=False)
        metrics = self._d_metrics(r_out, f_out, r_loss, f_loss, r_aux, y,
                                  r_aux_loss, pen_value, valid)
        metrics.update({
            "norm_mean": clip_stats.norm_mean,
            "norm_std": clip_stats.norm_std,
            "norm_max": clip_stats.norm_max,
            "frac_clipped": clip_stats.frac_clipped,
            # scalar in flat mode (the reference logs max_grad_norm as-is,
            # train.py:321), per-layer vector otherwise
            "clipping": clipping,
        })
        new_state = state.replace(d_params=d_params, d_opt_state=d_opt,
                                  g_batch_stats=g_stats)
        if self.adaptive:
            new_state = new_state.replace(clipping=clipping)
        return new_state, metrics

    # ---------------- D step: immediate sensitivity DP ----------------

    def _d_step_is(self, state: TrainState, x, y, pen_x, pen_y, rng,
                   phase_cache=None, fake_img=None):
        b = x.shape[0]
        ks = key_rows(rng, 3)
        k_z, k_noise, k_pen = ks[0], ks[1], ks[2]
        if fake_img is None:
            z = self.gen_z(k_z, b)
            fake_img, g_stats = self._fake_images(state, z, y, phase_cache)
        else:
            g_stats = state.g_batch_stats

        def total_loss(d_params, x_in):
            f_out, f_aux = self._d_apply(d_params, fake_img, y,
                                         aux=self.d_fake_aux, bpc=True)
            r_out, r_aux = self._d_apply(d_params, x_in, y, bpc=True)
            total = losses.d_real_loss(self.family, r_out) \
                + losses.d_fake_loss(self.family, f_out) \
                + self._aux_batch(r_aux, y, fake=False)
            if self.d_fake_aux:
                total = total + self._aux_batch(f_aux, y, fake=True)
            pen_value = jnp.asarray(0.0)
            if self.penalty_types:
                pen_value = penalty_mod.calc_penalty(
                    self._d_apply, d_params, self.penalty_types, pen_x, pen_y,
                    fake_img, y, k_pen, aux_penalty=self.aux_penalty,
                    n_classes=self.n_classes)
                total = total + pen_value
            return total, (r_out, f_out, r_aux, pen_value)

        grad_fn = jax.grad(total_loss, argnums=0, has_aux=True)

        use_scaling = self.is_scaling_mode != "standard"

        if self.is_per_param:
            grads, (r_out, f_out, r_aux, pen_value) = grad_fn(
                state.d_params, x)

            # sens_l = || d ||g_l|| / d x ||  per parameter tensor.
            def s_vec(x_in):
                g, _ = grad_fn(state.d_params, x_in)
                return gops.per_leaf_norms(g)
            jac = jax.jacrev(s_vec)(x)  # [L, B, H, W, C]
            sens = jnp.sqrt(jnp.sum(jac.reshape(jac.shape[0], -1) ** 2, axis=1))
            stds = self.sigma * sens  # [L]
        elif use_scaling:
            # value_and_grad with the parameter grads as aux: the norm's
            # inner forward+backward IS the grads computation — one shared
            # first-order pass by construction instead of two textually
            # separate ones. Measured NEUTRAL on the MNIST is epoch
            # (6.07 vs 6.07 ms interleaved A/B, round 5): XLA already
            # CSE'd the duplicate pass; kept because sharing by
            # construction does not depend on the optimizer noticing.
            v = state.scaling_vec

            def s_scaled(x_in):
                g, aux = grad_fn(state.d_params, x_in)
                ln = gops.per_leaf_norms(g)
                return jnp.sqrt(jnp.sum((ln / v) ** 2)), (g, aux)
            (_, (grads, (r_out, f_out, r_aux, pen_value))), gx = \
                jax.value_and_grad(s_scaled, has_aux=True)(x)
            sens = jnp.sqrt(jnp.sum(gx ** 2))
            stds = self.sigma * sens * v  # [L]
        else:
            def s_flat(x_in):
                g, aux = grad_fn(state.d_params, x_in)
                return gops.global_norm(g), (g, aux)
            (_, (grads, (r_out, f_out, r_aux, pen_value))), gx = \
                jax.value_and_grad(s_flat, has_aux=True)(x)
            sens = jnp.sqrt(jnp.sum(gx ** 2))
            n_leaves = len(jax.tree_util.tree_leaves(grads))
            stds = jnp.broadcast_to(self.sigma * sens, (n_leaves,))

        # One flat normal draw sliced per leaf (sigma folded into stds via
        # per-layer semantics) instead of a split-keys + per-leaf-draw loop:
        # ~3 RNG kernels instead of ~12 per step on the launch-bound MNIST
        # is-mode scan (same treatment the gc path got; disjoint slices of
        # one draw are independent normals, so the DP guarantee is
        # unchanged — the per-seed stream differs, nothing persists it).
        grads = gops.add_gaussian_noise(k_noise, grads, 1.0, stds,
                                        per_layer=True)

        updates, d_opt = self.d_tx.update(grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)

        new_scaling = state.scaling_vec
        if self.is_scaling_mode == "moving-avg-pl":
            gn = gops.per_leaf_norms(grads)
            new_scaling = state.scaling_vec * self.moving_avg_beta \
                + gn * (1 - self.moving_avg_beta)

        r_loss = losses.d_real_loss(self.family, r_out)
        f_loss = losses.d_fake_loss(self.family, f_out)
        r_aux_loss = self._aux_batch(r_aux, y, fake=False)
        metrics = self._d_metrics(r_out, f_out, r_loss, f_loss, r_aux, y,
                                  r_aux_loss, pen_value)
        metrics["is_sens"] = sens
        return state.replace(d_params=d_params, d_opt_state=d_opt,
                             g_batch_stats=g_stats,
                             scaling_vec=new_scaling), metrics

    # ---------------- D step: trimmed-mean / sign-vote (experimental) -----

    def _d_step_tmsv(self, state: TrainState, x, y, pen_x, pen_y, rng,
                      phase_cache=None, fake_img=None):
        b = x.shape[0]
        ks = key_rows(rng, 3)
        k_z, k_noise, k_pen = ks[0], ks[1], ks[2]
        if fake_img is None:
            z = self.gen_z(k_z, b)
            fake_img, g_stats = self._fake_images(state, z, y, phase_cache)
        else:
            g_stats = state.g_batch_stats
        row_w = self._row_weights(y) if self.conditional else None

        f, args = self._combined_ps_args(x, y, fake_img, row_w)
        ps = gops.per_sample_grads(f, state.d_params, *args, chunk=self.chunk)

        from csl_gan_tpu.ops import tmsv
        leaves, treedef = jax.tree_util.tree_flatten(ps)
        keys = jax.random.split(k_noise, len(leaves))
        out_leaves = []
        if self.dp_mode == "tm":
            for g, k in zip(leaves, keys):
                out_leaves.append(tmsv.trimmed_mean(
                    g, k, self.tm_m, self.tm_min_val, self.tm_max_val,
                    self.smooth_sens_t, self.rho_per_step))
        else:
            for g, k in zip(leaves, keys):
                out_leaves.append(tmsv.sign_vote(g, k, self.rho_per_step))
        grads = jax.tree_util.tree_unflatten(treedef, out_leaves)

        pen_value = jnp.asarray(0.0)
        if self.penalty_types:
            pen_value, pen_grads = self._penalty_grads(
                state.d_params, pen_x, pen_y, fake_img, y, k_pen)
            grads = jax.tree.map(jnp.add, grads, pen_grads)  # train.py:433

        updates, d_opt = self.d_tx.update(grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)

        r_out, r_aux = self._d_apply(state.d_params, x, y)
        f_out, _ = self._d_apply(state.d_params, fake_img, y, aux=False)
        metrics = self._d_metrics(
            r_out, f_out, losses.d_real_loss(self.family, r_out),
            losses.d_fake_loss(self.family, f_out), r_aux, y,
            self._aux_batch(r_aux, y, fake=False), pen_value)
        return state.replace(d_params=d_params, d_opt_state=d_opt,
                             g_batch_stats=g_stats), metrics

    # ---------------- G step ----------------

    def _g_step(self, state: TrainState, rng):
        b = self.opt.batch_size
        ks = key_rows(rng, 2)
        k_z, k_y = ks[0], ks[1]
        z = self.gen_z(k_z, b)
        y = self.gen_y(k_y, b)

        def loss_fn(g_params):
            variables = {"params": g_params}
            if self.g_has_bn:
                variables["batch_stats"] = state.g_batch_stats
                img, upd = self.G.apply(variables, z, y, train=True,
                                        mutable=["batch_stats"])
                new_stats = upd["batch_stats"]
            else:
                img = self.G.apply(variables, z, y, train=True)
                new_stats = state.g_batch_stats
            out, aux_o = self._d_apply(
                state.d_params, img, y,
                bpc=self.use_bpc and self.bpc_g and bool(self.opt.use_dp))
            adv = losses.g_adv_loss(self.family, out)
            aux = self._aux_batch(aux_o, y, fake=False) if self.is_acgan \
                else jnp.asarray(0.0)
            return adv + aux, (new_stats, adv, aux, aux_o)

        (_, (new_stats, adv, aux, aux_o)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.g_params)
        updates, g_opt = self.g_tx.update(grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)

        metrics = {"g_adv_loss": adv}
        if self.is_acgan:
            metrics["g_aux_loss"] = aux
            metrics["g_aux_acc"] = 100.0 * jnp.mean(
                (jnp.argmax(aux_o, axis=1) == y).astype(jnp.float32)) \
                if aux_o is not None else jnp.asarray(0.0)
        return state.replace(g_params=g_params, g_opt_state=g_opt,
                             g_batch_stats=new_stats), metrics

    # ---------------- segment runner (device-side interval scan) ---------

    def _d_core(self, state, x, y, pen_x, pen_y, ax, ay, rng, use_dp: bool,
                valid=None, phase_cache=None, fake_img=None):
        """Static dispatch over the per-batch D update variants.

        `fake_img`, when supplied (grouped runner / grouped bench), replaces
        the in-step fresh-fake G forward with a slice of the cadence
        group's one batched forward (batch_fakes)."""
        if use_dp and self.dp_mode == "gc":
            return self._d_step_gc(state, x, y, pen_x, pen_y, ax, ay, rng,
                                   valid, phase_cache, fake_img)
        if use_dp and self.dp_mode == "is":
            return self._d_step_is(state, x, y, pen_x, pen_y, rng,
                                   phase_cache, fake_img)
        if use_dp and self.dp_mode in ("tm", "sv"):
            return self._d_step_tmsv(state, x, y, pen_x, pen_y, rng,
                                     phase_cache, fake_img)
        return self._d_step_plain(state, x, y, pen_x, pen_y, rng,
                                  phase_cache, fake_img)

    def build_segment_runner(self, use_dp: bool, mean_sample_fn=None,
                             preprocess=None, batch_sharding=None,
                             assume_full_cadence=False, grouped=False,
                             grouped_p=0):
        """One jitted lax.scan over a whole logging interval of batches
        (moved to training/segment_runner.py; kept here as the public
        entry point)."""
        from csl_gan_tpu.training import segment_runner
        return segment_runner.build_segment_runner(
            self, use_dp, mean_sample_fn, preprocess, batch_sharding,
            assume_full_cadence, grouped, grouped_p)

    def build_epochs_runner(self, use_dp: bool, n_epochs: int,
                            n_batches: int, mean_sample_fn=None,
                            preprocess=None, batch_sharding=None,
                            assume_full_cadence=False, grouped=False):
        """n_epochs whole epochs in one dispatch (segment_runner.py)."""
        from csl_gan_tpu.training import segment_runner
        return segment_runner.build_epochs_runner(
            self, use_dp, n_epochs, n_batches, mean_sample_fn, preprocess,
            batch_sharding, assume_full_cadence, grouped)

    def grouped_runner_ok(self, use_dp: bool) -> bool:
        """Whether the cadence-grouped runner (--group_fakes) applies to
        this config: n_d_steps > 1 (otherwise there is nothing to batch),
        no Poisson subsampling, BatchNorm-free G. The caller must
        additionally guarantee its g_mask is the standard cadence pattern
        and pass `start` as a Python int (segment_runner._build_grouped_run
        docstring)."""
        return (bool(opt_get(self.opt, "group_fakes", False))
                and int(self.opt.n_d_steps) > 1
                and not (self.poisson and use_dp)
                and not self.g_has_bn)

    # ---------------- sampling (fixed-z grids, eval mode) ----------------

    @functools.partial(jax.jit, static_argnums=0)
    def sample_images(self, state: TrainState, z, y, phase_cache=None):
        """Eval-mode sampling (forward-only: uses the all-blocks gn4
        variant). `phase_cache` — collapse_phase_kernels(g_params) computed
        ONCE per checkpoint by the caller — skips the in-dispatch phase-
        kernel collapse on every sampling batch (the serving-path analog
        of --phase_carry; pure win on fixed params)."""
        variables = {"params": state.g_params}
        if phase_cache:
            variables["phase_cache"] = phase_cache
        if self.g_has_bn:
            variables["batch_stats"] = state.g_batch_stats
        return self.G_fwd.apply(variables, z, y, train=False)
