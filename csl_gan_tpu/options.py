"""Config / flag system (parity with reference options.py:11-287).

The reference's ``opt.txt`` JSON is the contract every training and evaluation
tool reads, so flag names, per-dataset default dicts, derived flags, the
validation rules, and the resume-merge semantics are reproduced here exactly.
TPU-specific flags (mesh shape, per-sample chunking, platform) are additive
and default to behavior-preserving values.

Deliberate divergences from the reference (documented, per SURVEY.md §5.6):
  - No global torch seeding: ``opt.manual_seed`` / ``opt.weights_seed`` become
    explicit ``jax.random`` keys threaded by the caller.
  - ``fill_defaults`` keeps the reference quirk that only ``None``/``False``
    values are overwritten (reference options.py:93-96).
"""

from __future__ import annotations

import argparse
import json
import os
import random
from argparse import Namespace
from datetime import datetime

# Per-dataset default dicts (reference options.py:11-91).
MNIST_DEFAULTS = {
    "data_path": "/persist/datasets/mnist/",
    "model": "Vanilla",
    "im_size": 28,
    "n_epochs": 10000,
    "g_lr": 0.0002,
    "d_lr": 0.0002,
    "batch_size": 600,
    "batch_split_size": 60,
    "train_set_size": 60000,
    "g_latent_dim": 100,
    "n_d_steps": 1,
    "phase_gn4_max_f": -1,
    "g_label_emb_mode": "concat",
    "d_label_emb_mode": "concat",
    "aux_loss_type": "cross_entropy",
    "adam_b1": 0.9,
    "adam_b2": 0.999,
    "penalty": [],
    "iter_on_mean_samples": 0,
    "mean_sample_size": 5000,
    "mean_sample_noise_std": 0.22,
    "delta": 1e-5,
    "sigma": 5.0,
    "grad_clip_mode": "standard",
    "clipping_param": 4.0,
    "imm_sens_scaling_mode": "standard",
    "tm_m": 10,
    "tm_max_val": -1,
    "tm_min_val": 1,
    "save_every": 50,
    "log_every": 100000,  # rounded down to 1 epoch
    "sample_every": 600000,
    "sample_num": 100,
    "n_classes": 10,
    "weights_seed": 42,
}

CELEBA_DEFAULTS = {
    "data_path": "/persist/datasets/celeba/img_align_celeba/all/",
    "label_path": "/persist/datasets/celeba/Anno/list_attr_celeba.txt",
    "label_attr": "Male",
    "model": "DeepConvResNet",
    "im_size": 64,
    "n_epochs": 1000,
    "g_lr": 0.0001,
    "d_lr": 0.0001,
    "batch_size": 128,
    "batch_split_size": 32,
    "train_set_size": 180000,
    "public_set_size": 0,
    "g_latent_dim": 128,
    "n_d_steps": 5,
    "phase_gn4_max_f": 64,
    "g_label_emb_mode": "concat",
    "d_label_emb_mode": "concat",
    "aux_loss_type": "wasserstein",
    "adam_b1": 0.0,
    "adam_b2": 0.9,
    "penalty": ["WGAN-GP"],
    "iter_on_mean_samples": 0,
    "mean_sample_size": 1000,
    "mean_sample_noise_std": 0.12,
    "delta": 1e-6,
    "sigma": 0.5,
    "imm_sens_scaling_vec": [20, 2, 15, 1.5, 10, 1.5, 10, 1, 30],
    "imm_sens_scaling_mode": "standard",
    "imm_sens_per_param": True,
    "grad_clip_mode": "standard",
    "clipping_param": 200,
    "clipping_param_per_layer": [1000, 200, 1000, 100, 1000, 100, 1000, 5, 2500],
    "tm_m": 10,
    "tm_min_val": -1,
    "tm_max_val": 1,
    "save_every": 10,
    "log_every": 20000,
    "sample_every": 60000,
    "sample_num": 25,
    "n_classes": 2,
    "gp_lambda": 10,
}

ALWAYS_KEEP_ARGS = ["g_device", "d_device", "num_workers", "resume_path", "resume_epochs"]


def add_slash(path):
    """Append a trailing slash if missing (reference util.py:10-11)."""
    return None if path is None else (path if path.endswith("/") else path + "/")


def apply_platform(opt) -> None:
    """Force the JAX platform recorded in the config (``--platform``), if any.

    Must run before any JAX backend initialization. Called by train.py AND by
    every eval tool right after ``load_opt`` — a run trained with
    ``--platform cpu`` must be evaluable without touching the TPU backend
    (gensamples/temp_file/downstream/mem_inf_attack previously ignored the
    saved platform and hung when the TPU relay was unreachable).
    """
    platform = getattr(opt, "platform", None)
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)


def fill_defaults(opt, default_dict):
    """Apply per-dataset defaults, overwriting only None/False values.

    Preserves the reference quirk (options.py:93-96) that boolean flags whose
    default-dict value is truthy cannot be explicitly disabled from the CLI.
    """
    for key, val in default_dict.items():
        if key not in opt.__dict__ or opt.__dict__[key] is None or opt.__dict__[key] is False:
            opt.__dict__[key] = val


def none_or_str(value):
    return None if value == "None" else value


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_parser() -> argparse.ArgumentParser:
    """All reference flags (options.py:114-206) plus TPU-native extensions."""
    parser = argparse.ArgumentParser()

    parser.add_argument("--weights_seed", type=int, default=42)
    parser.add_argument("--manual_seed", type=int, default=-1)

    parser.add_argument("dataset", type=str, choices=["MNIST", "CelebA"])
    parser.add_argument("-d", "--data_path", type=str, default=None)
    parser.add_argument("-lp", "--label_path", type=str, default=None)
    parser.add_argument("-la", "--label_attr", type=str, default=None)
    parser.add_argument("--model", type=str, choices=["Vanilla", "DeepConvResNet"], default=None)
    parser.add_argument("--im_size", type=int, default=None, choices=[64, 48])
    parser.add_argument("--download_mnist", default=False, action="store_true")
    parser.add_argument("-o", "--output_dir", type=str, default=None)

    parser.add_argument("-rp", "--resume_path", type=str, default=None)
    parser.add_argument("-re", "--resume_epochs", type=int, default=0)
    parser.add_argument("-ka", "--keep_args", type=str, nargs="*", default=[])

    parser.add_argument("-ne", "--n_epochs", type=int, default=None)
    parser.add_argument("--d_lr", type=float, default=None)
    parser.add_argument("--g_lr", type=float, default=None)
    parser.add_argument("-wd", "--weight_decay", type=float, default=0)
    parser.add_argument("-bs", "--batch_size", type=int, default=None)
    parser.add_argument("-bss", "--batch_split_size", type=int, default=None)
    parser.add_argument("-tss", "--train_set_size", type=int, default=None)

    # Device flags are kept for opt.txt/tool surface compatibility. On TPU
    # they map to mesh/sharding presets (see parallel/mesh.py); the reference
    # used them for its two-GPU G/D model-parallel split (init_util.py:65-67).
    parser.add_argument("-gd", "--g_device", type=str, default="cpu")
    parser.add_argument("-dd", "--d_device", type=str, default="cpu")
    parser.add_argument("-nw", "--num_workers", type=int, default=8)

    parser.add_argument("--g_latent_dim", type=int, default=None)
    parser.add_argument("--n_d_steps", type=int, default=None)
    parser.add_argument("--train_d_until_threshold", type=float, default=None,
                        help="Skip G training until D adversarial loss is below this threshold "
                             "(default 1e10 = always train G). Unlike the reference, an "
                             "explicit value is RESPECTED for DP DeepConvResNet configs "
                             "instead of being force-overwritten to -1 (see RESULTS.md "
                             "utility study: the forced -1 freezes G).")
    parser.add_argument("-cond", "--conditional", action="store_true", default=False)
    parser.add_argument("--g_label_emb_mode", type=str, choices=["embed", "concat"], default=None)
    parser.add_argument("--d_label_emb_mode", type=str, choices=["embed", "concat"], default=None)
    parser.add_argument("--conditional_arch", type=str, choices=["CGAN", "ACGAN", "WCGAN"],
                        default="ACGAN",
                        help="Standard conditional GAN, auxiliary-classifier GAN, or "
                             "Wasserstein conditional GAN architecture.")
    parser.add_argument("--aux_loss_type", type=str, choices=["wasserstein", "cross_entropy"], default=None)
    parser.add_argument("--aux_loss_scalar", type=float, default=1)
    parser.add_argument("--aux_penalty", type=str2bool, default=True)
    parser.add_argument("--d_fake_aux_loss", type=str2bool, default=True)
    parser.add_argument("--adam_b1", type=float, default=None)
    parser.add_argument("--adam_b2", type=float, default=None)
    parser.add_argument("--penalty", type=str, nargs="*",
                        choices=[None, "WGAN-GP", "WGAN-GP1", "DRAGAN", "DRAGAN1"], default=None,
                        help="Gradient penalty list; a trailing 1 means one-sided.")

    parser.add_argument("-pss", "--public_set_size", type=int, default=0)
    parser.add_argument("-nms", "--num_mean_samples", type=int, default=0)
    parser.add_argument("-pupd", "--penalty_use_public_data", type=str2bool, default=True)
    parser.add_argument("-wi", "--warmup_iter", type=int, default=0)

    parser.add_argument("--mean_sample_size", type=int, default=None)
    # The reference declares this flag as type=int (reference options.py:166),
    # which silently forbids fractional noise stds from the CLI even though
    # both per-dataset defaults are fractional — fixed divergence.
    parser.add_argument("--mean_sample_noise_std", type=float, default=None)

    parser.add_argument("--delta", type=float, default=None)
    parser.add_argument("--sigma", type=float, default=None)
    parser.add_argument("-eb", "--epsilon_budget", type=float, default=None)
    parser.add_argument("-dpm", "--dp_mode", type=str, choices=["gc", "is", "tm", "sv"], default=None)

    parser.add_argument("-ispp", "--imm_sens_per_param", type=str2bool, default=False,
                        help="Calculates IS for each parameter separately.")
    parser.add_argument("-issv", "--imm_sens_scaling_vec", type=float, nargs="*", default=None)
    parser.add_argument("-issm", "--imm_sens_scaling_mode", type=str,
                        choices=["standard", "constant-pl", "moving-avg-pl"], default=None,
                        help="constant per-layer, or moving-average per-layer "
                             "(v = v*beta + grad_norm*(1-beta) per layer)")
    parser.add_argument("--moving_avg_beta", type=float, default=0.9)

    parser.add_argument("-gcs", "--grad_clip_split", type=str2bool, default=True)
    parser.add_argument("-gcm", "--grad_clip_mode", type=str,
                        choices=["standard", "adaptive", "constant-pl", "adaptive-pl"], default=None,
                        help="standard (flat norm clip), adaptive, constant per-layer, "
                             "adaptive per-layer (scales adaptive_stat of public/mean data "
                             "grad norms by adaptive_scalar).")
    parser.add_argument("-c", "--clipping_param", type=float, default=None)
    parser.add_argument("-cpl", "--clipping_param_per_layer", type=float, nargs="*", default=None)
    parser.add_argument("-as", "--adaptive_scalar", type=float, default=1.5)
    parser.add_argument("--adaptive_stat", choices=["mean", "max"], default="mean")

    parser.add_argument("--smooth_sens_t", type=float, default=0.01)
    parser.add_argument("--tm_m", type=int, default=None)
    parser.add_argument("--tm_max_val", type=float, default=None)
    parser.add_argument("--tm_min_val", type=float, default=None)
    parser.add_argument("--tm_rho_per_epoch", type=float, default=10)
    parser.add_argument("--tm_sens_compute_bs", type=float, default=None,
                        help="Accepted for reference-CLI parity only "
                             "(reference train.py:126 passes it to the TM "
                             "engine as a sensitivity-computation batch "
                             "size). This framework computes the "
                             "trimmed-mean smooth-sensitivity bound "
                             "analytically per coordinate inside the train "
                             "step (ops/tmsv.py) — there is no separate "
                             "sensitivity pass to batch, so the flag has no "
                             "effect; a notice is printed when set.")

    parser.add_argument("-bpc", "--backprop_clip", type=str2bool, default=False)
    parser.add_argument("--bpc_back_clip_param", type=float, default=0.01)
    parser.add_argument("--bpc_back_clip_param_pl", type=float, nargs="*", default=None)
    parser.add_argument("--bpc_forward_clip_param", type=float, default=20)
    parser.add_argument("--bpc_forward_clip_param_pl", type=float, nargs="*", default=None)
    parser.add_argument("-bpcaas", "--bpc_auto_activation_scale", type=float, default=0.2)
    parser.add_argument("-bpcawgs", "--bpc_auto_weight_grad_scale", type=float, default=1e-3)
    parser.add_argument("--bpc_during_g_train", type=str2bool, default=True)

    parser.add_argument("--save_every", type=int, default=None)   # epochs
    parser.add_argument("--log_every", type=int, default=None)    # samples
    parser.add_argument("--sample_every", type=int, default=None) # samples
    parser.add_argument("--sample_num", type=int, default=None)
    parser.add_argument("-p", "--profile_training", default=False, action="store_true")

    # --- TPU-native extensions (additive; absent from reference opt.txt is fine
    # because load_opt tolerates extra/missing keys via getattr defaults) ---
    parser.add_argument("--mesh_shape", type=int, default=None,
                        help="Number of devices on the data-parallel mesh axis; "
                             "None = all visible devices.")
    parser.add_argument("--fsdp", type=str2bool, default=False,
                        help="Shard G/D params and Adam moments over the "
                             "mesh's data axis (ZeRO-3 style; "
                             "parallel/mesh.py). Per-device param+optimizer "
                             "memory drops ~n_devices x; GSPMD inserts the "
                             "gathers. No effect on a 1-device mesh.")
    parser.add_argument("--tp", type=int, default=1,
                        help="Tensor-parallel (model) mesh axis size; must "
                             "divide the mesh size. Conv/dense kernels and "
                             "biases shard their output-channel dim over "
                             "the `model` axis (column-parallel); GSPMD "
                             "propagates activation shardings and inserts "
                             "the collectives (parallel/mesh.py state_spec)."
                             " Composes with --fsdp on the data axis.")
    parser.add_argument("--ref_pixel_shuffle", type=str2bool, default=False,
                        help="Reference-checkpoint interop: use the "
                             "reference's cat-x4 + pixel_shuffle upsampling "
                             "in the DCResNet G (reference "
                             "DCResNet_models.py:13-17), which applies a "
                             "phase-dependent CHANNEL PERMUTATION rather "
                             "than clean nearest-neighbor upsampling. "
                             "Checkpoints converted by "
                             "convert_reference_checkpoint.py set this in "
                             "their opt.txt so G outputs are functionally "
                             "exact; fresh training keeps the clean (and "
                             "faster, phase-fused) upsampling.")
    parser.add_argument("--per_sample_chunk", type=int, default=None,
                        help="Chunk size for lax.scan-accumulated per-sample gradients "
                             "(bounds per-sample grad memory); None = whole batch vmap.")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a JAX platform (cpu/tpu); None = JAX default.")
    parser.add_argument("--rbg", type=str2bool, default=True,
                        help="Use the XLA RngBitGenerator PRNG (rbg) for all "
                             "randomness: 1.32x the MNIST DP epoch vs JAX's "
                             "threefry default (per-step key splits are "
                             "launch-bound work). Same PRNG quality class as "
                             "the reference's torch Philox noise, but rbg "
                             "streams are NOT guaranteed bit-stable across "
                             "XLA/backend versions — for seed replay across "
                             "environment upgrades use --rbg false "
                             "(threefry, stable everywhere).")
    parser.add_argument("--multihost", type=str2bool, default=False,
                        help="Multi-process (DCN) training: call "
                             "jax.distributed.initialize and build the mesh "
                             "over all processes' devices. Every process "
                             "runs the same program on identical host data "
                             "(same seeds); arrays are fed via "
                             "make_array_from_process_local_data. Only "
                             "process 0's output directory is authoritative "
                             "(other processes write to scratch).")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 for --multihost; None "
                             "= jax auto-detection (TPU pods).")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="Total process count for --multihost; None = "
                             "jax auto-detection.")
    parser.add_argument("--process_id", type=int, default=None,
                        help="This process's index for --multihost; None = "
                             "jax auto-detection.")
    parser.add_argument("--host_loop", type=str2bool, default=False,
                        help="Force the per-batch host loop instead of the "
                             "device-side interval scan.")
    parser.add_argument("--bf16", type=str2bool, default=False,
                        help="bfloat16 compute for the DCResNet G and D "
                             "forward/backward (params and DP clipping "
                             "arithmetic stay fp32). DP rigor: the G update "
                             "and the D fake/penalty passes are "
                             "post-processing; the private real pass runs "
                             "conv-ghost clipping with fp32-accumulated "
                             "norms, fp32-output weighted sums, and a bf16 "
                             "margin on the clip bound (ops/conv_ghost.py) "
                             "— or the generic fp32-per-sample-grad path "
                             "when conv_ghost is off.")
    parser.add_argument("--poisson", type=str2bool, default=False,
                        help="Exact Poisson subsampling: per-step "
                             "Bernoulli(B/N) inclusion over the dataset "
                             "(static-shape pad/mask), matching the RDP "
                             "accountant's sampling assumption exactly. "
                             "The reference (and the default here) shuffles "
                             "fixed-size batches instead (SURVEY.md §2.1 "
                             "caveat). gc mode only.")
    parser.add_argument("--conv_ghost", type=str2bool, default=True,
                        help="Use analytic (im2col ghost-norm) per-sample "
                             "clipping for the DCResNet discriminator's "
                             "private pass instead of the generic "
                             "vmap/two-pass paths.")
    parser.add_argument("--pallas", type=str2bool, default=False,
                        help="Use the fused Pallas clip+noise kernel on TPU. "
                             "Off by default: XLA algebraically fuses the "
                             "clip-weighted sum into the per-sample-grad vjp "
                             "(no [B,P] materialization), which profiles "
                             "faster for these models; the kernel wins only "
                             "when per-sample grads are materialized anyway.")
    parser.add_argument("--stop_on_g_freeze", type=int, default=0,
                        help="Stop training (with a normal final checkpoint) "
                             "after N consecutive logging intervals with "
                             "ZERO G updates. The reference's forced "
                             "train_d_until_threshold=-1 for DP DCResNet "
                             "runs freezes G once the noised D stops "
                             "reaching the threshold (RESULTS.md utility "
                             "study: epochs after the freeze spend privacy "
                             "budget with no G progress; stopping at the "
                             "freeze point reaches the same FID at ~2/3 "
                             "the epsilon). 0 = off (reference parity). "
                             "Counts G updates per logging interval, so "
                             "set N with the log cadence in mind (and "
                             ">= 1 G cadence point per interval).")
    parser.add_argument("--bf16_table", type=str2bool, default=True,
                        help="Store flat float device image tables "
                             "(MNIST-type datasets) in bfloat16: halves "
                             "the per-step batch-gather HBM traffic (the "
                             "largest single op of the launch-bound MNIST "
                             "epoch). Rows convert to fp32 right after "
                             "the gather, so all training/DP arithmetic "
                             "is exact on the stored values; the storage "
                             "rounding (<= 2^-8 relative) is of the same "
                             "order as the source u8 pixel quantization. "
                             "One-hot and label columns are exact. "
                             "`--bf16_table false` restores exact fp32 "
                             "storage (bit-parity with earlier rounds).")
    parser.add_argument("--u8_table", type=str2bool, default=False,
                        help="Store flat float device image tables as "
                             "uint8 (pixels x255): halves the per-step "
                             "batch-gather bytes AGAIN vs --bf16_table. "
                             "Pixels are dequantized u8/255 in fp32 right "
                             "after the gather — BIT-identical to fp32 "
                             "storage when the source pixels are "
                             "u8-derived (real MNIST is u8/255); "
                             "non-u8-exact pixels (e.g. the synthetic "
                             "fallback) quantize to the nearest 1/255 "
                             "with a printed notice. Disables the "
                             "whole-epoch Pallas megakernel for the "
                             "config (it consumes float rows); mainly a "
                             "win for the XLA-scan paths (is mode).")
    parser.add_argument("--phase_gn4", type=str2bool, default=True,
                        help="DCResNet G: the second GroupNorm of each "
                             "upsample block consumes the fused "
                             "upsample-conv's raw [N,H,W,4F] phase-stacked "
                             "output (per-feature stats pool the 4 phase "
                             "copies on the tiny per-channel sums) instead "
                             "of the 6-D [N,H,W,2,2,F] phase view. Same "
                             "math; the 6-D view halves lane utilization "
                             "for F<128 stages and forces relayout copies "
                             "at the conv/GN boundary.")
    parser.add_argument("--phase_carry", type=str2bool, default=True,
                        help="Carry the DCResNet G's collapsed phase-conv "
                             "kernels across D steps in the interval scan "
                             "(recomputed only on G updates). The collapse "
                             "is a weight-only transform that otherwise "
                             "re-runs inside every D step's fresh-fake G "
                             "forward (~0.3-0.4 ms/step on the CelebA bf16 "
                             "flagship). Bit-identical training either way "
                             "(tests/test_segment_runner.py).")
    parser.add_argument("--phase_gn4_max_f", type=int, default=None,
                        help="Per-block cutoff for --phase_gn4 at the G "
                             "UPDATE call site: apply the raw-4F GroupNorm "
                             "only to upsample blocks with <= N features "
                             "there (-1 = all blocks). The 6-D phase view "
                             "only wastes lanes for F<128, and the wide "
                             "blocks' raw-4F GN backward is a measured G "
                             "step cost while their forward is a D-step "
                             "win — so the D steps' forward-only fake path "
                             "(and sampling/serving) always use all blocks "
                             "when --phase_gn4 is on, and this cutoff "
                             "shapes only the G update (RESULTS.md round-4 "
                             "gn4 policy data). Recorded in opt.txt "
                             "(supersedes the round-4 CSL_GN4_MAX_F env "
                             "A/B knob). Default: 64 for CelebA (captures "
                             "both measured wins, RESULTS.md round 5), "
                             "-1 (all blocks) for MNIST.")
    parser.add_argument("--group_fakes", type=str2bool, default=False,
                        help="Generate the fresh fake batches of a whole "
                             "n_d_steps cadence group in ONE G forward "
                             "(G params can only change at cadence "
                             "points, so the per-step z draws — unchanged "
                             "— run through an identical G). Value-"
                             "identical per step; applies to the interval "
                             "scan when n_d_steps > 1 (not Poisson, not "
                             "BatchNorm-G). DEFAULT OFF — a measured "
                             "NEGATIVE on v5e (RESULTS.md round 5): the "
                             "CelebA G forward is bandwidth-bound with "
                             "no launch overhead to amortize, and at 5x "
                             "batch XLA assigns batch-minor layouts to "
                             "several stage intermediates (~0.3 ms/step "
                             "of extra relayout copies; D step 11.82 -> "
                             "12.14 ms interleaved A/B). Kept as an "
                             "opt-in lever for other shapes/hardware.")
    parser.add_argument("--pallas_epoch", type=str2bool, default=True,
                        help="Run whole epochs of the MNIST vanilla DP "
                             "flagship as ONE Pallas megakernel (params and "
                             "Adam moments stay in VMEM across the epoch's "
                             "steps; ops/pallas_epoch.py). Auto-gated to "
                             "eligible configs on a single TPU; other "
                             "configs use the XLA interval scan either way.")
    return parser


def derive_and_validate(opt) -> None:
    """Derived flags + validation rules (reference options.py:222-256)."""
    # Log/sample intervals in epochs when >= one epoch of samples.
    opt.log_every_epochs = -1 if opt.log_every < opt.train_set_size else opt.log_every // opt.train_set_size
    opt.sample_every_epochs = -1 if opt.sample_every < opt.train_set_size else opt.sample_every // opt.train_set_size

    # Round intervals to batch multiples.
    opt.log_every = max((opt.log_every // opt.batch_size) * opt.batch_size, 1)
    opt.sample_every = max((opt.sample_every // opt.batch_size) * opt.batch_size, 1)

    opt.use_dp = opt.dp_mode is not None
    opt.use_grad_clip_per_layer = opt.grad_clip_mode != "standard" and opt.grad_clip_mode != "adaptive"
    opt.per_sample_grad = opt.dp_mode in ["gc", "tm", "sv"]

    opt.is_acgan = opt.conditional and opt.conditional_arch == "ACGAN"
    opt.use_aux_loss = opt.conditional and opt.conditional_arch in ["ACGAN", "WCGAN"]

    if opt.conditional_arch == "WCGAN" and opt.aux_penalty:
        print("Setting aux_penalty to false due to using WCGAN.")
        opt.aux_penalty = False
    # Reference train.py forces threshold=-1 for every DP DeepConvResNet run
    # (never train G on a D-loss condition), which freezes G once the noised
    # D can't reach the threshold (RESULTS.md utility study). Deviation: the
    # force applies only when the user did NOT set a value, so the operating
    # point is tunable from the CLI.
    tdut_user_set = opt.train_d_until_threshold is not None
    if not tdut_user_set:
        opt.train_d_until_threshold = 1e10
    if opt.model == "DeepConvResNet" and opt.use_dp:
        if not tdut_user_set:
            print("Setting train_d_until_threshold to -1, which is generally recommended for WGAN using DP")
            opt.train_d_until_threshold = -1
        else:
            print(f"Keeping user-set train_d_until_threshold="
                  f"{opt.train_d_until_threshold} (the reference would force "
                  "-1 here; see RESULTS.md on why -1 can freeze G).")
    if opt.backprop_clip:
        print("Backpropagation clipping implementation is experimental.")
    if opt.tm_sens_compute_bs is not None:
        # Not silently ignored (VERDICT round-2 missing #3): the analytic
        # per-coordinate smooth-sensitivity bound (ops/tmsv.py) leaves no
        # separate sensitivity pass to batch.
        print("Note: --tm_sens_compute_bs is accepted for reference-CLI "
              "parity but has no effect here (the trimmed-mean sensitivity "
              "bound is computed analytically inside the train step).")

    # Hard incompatibility rules (reference options.py:246-256).
    if opt.batch_size > opt.train_set_size:
        # Full-batch semantics (loader.py drops the trailing partial batch,
        # matching the reference's drop_last loaders): bs > N means every
        # epoch yields ZERO batches — training silently does nothing — and
        # the RDP sampling rate q = bs/N > 1 is mathematically undefined.
        raise Exception(
            f"batch_size ({opt.batch_size}) exceeds train_set_size "
            f"({opt.train_set_size}): every epoch would run zero batches "
            "(full batches only) and the DP sampling rate would exceed 1. "
            "Lower -bs or raise -tss.")
    if opt.num_mean_samples > 0 and opt.mean_sample_size > opt.train_set_size:
        # Same failure class for the mean sampler: its RDP subsampling rate
        # is mean_sample_size / (smallest class size or dataset size), which
        # is certainly > 1 here. (Class imbalance can still push it over 1
        # at runtime; privacy/mean_sampler.get_privacy_cost raises a clear
        # error there.)
        raise Exception(
            f"mean_sample_size ({opt.mean_sample_size}) exceeds "
            f"train_set_size ({opt.train_set_size}): the mean-sampler "
            "subsampling rate would exceed 1. Lower --mean_sample_size or "
            "raise -tss.")
    if opt.imm_sens_per_param and not (opt.imm_sens_scaling_mode is None or opt.imm_sens_scaling_mode == "standard"):
        raise Exception("Calculating IS per parameter does not require per parameter scaling. "
                        "Scaling estimates per-parameter calculation.")
    if opt.public_set_size > 0 and opt.num_mean_samples > 0:
        raise Exception("Both public data partition and mean samples were configured, "
                        "please select only one.")
    if len(opt.penalty) > 0 and opt.use_dp and opt.penalty_use_public_data \
            and opt.public_set_size < 1 and opt.num_mean_samples < 1:
        raise Exception("In order to enable gradient penalty using public data, please enable "
                        "mean sampling by setting num_mean_samples or public data by setting "
                        "public_set_size.")
    if len(opt.penalty) > 0 and opt.use_dp and opt.public_set_size < 1 and opt.num_mean_samples < 1:
        print("Currently configured to calculate penalty per-sample. It is strongly recommended "
              "that you use public data or mean samples for gradient penalties when using grad "
              "clipping.")
    if (opt.g_label_emb_mode != "concat" or opt.d_label_emb_mode != "concat") and opt.model == "Vanilla":
        raise Exception("Vanilla model with embedded labels not implemented")
    if opt.conditional and opt.n_classes > 1 and opt.d_label_emb_mode == "embed":
        # The reference raises this at D construction only when n_classes > 1
        # (models.py:32-34 — the embed branch is inside the `if n_classes > 1`
        # block; a single-class conditional config is accepted). Keep the
        # same surface but fail at config time.
        raise Exception("Embed for D not implemented")
    if opt.poisson and opt.dp_mode != "gc":
        raise Exception("--poisson (exact Poisson subsampling) is only "
                        "implemented for the gradient-clipping DP mode "
                        "(-dpm gc).")
    if opt.use_dp and (opt.grad_clip_mode or "").startswith("adaptive") \
            and opt.public_set_size < 1 and opt.num_mean_samples < 1:
        # The reference's update_adaptive_clipping_params unconditionally
        # reads public data or the mean sampler (train.py:204-216) and
        # crashes with neither; make that a clear config-time error. It also
        # keeps the adaptive statistic off sensitive data (unaccounted
        # privacy leakage otherwise).
        raise Exception("Adaptive clipping derives its thresholds from "
                        "public data: set public_set_size or "
                        "num_mean_samples.")


def parse(argv=None) -> Namespace:
    """Parse CLI args into the opt namespace (reference options.py:113-281)."""
    parser = build_parser()
    opt = parser.parse_args(argv)
    opt.keep_args = opt.keep_args + ALWAYS_KEEP_ARGS

    opt.data_path = add_slash(opt.data_path)
    opt.resume_path = add_slash(opt.resume_path)
    opt.output_dir = add_slash(opt.output_dir)

    # Whether the per-layer vectors were explicitly given on the CLI (vs
    # filled from the per-dataset defaults below). Consumers use this to
    # adapt the positional default to the actual model leaf structure
    # (conditional aux head / 48px presets) instead of mis-mapping it.
    opt.cpl_user_set = opt.clipping_param_per_layer is not None
    opt.issv_user_set = opt.imm_sens_scaling_vec is not None

    if opt.resume_path is None:
        if opt.dataset == "MNIST":
            fill_defaults(opt, MNIST_DEFAULTS)
        elif opt.dataset == "CelebA":
            fill_defaults(opt, CELEBA_DEFAULTS)

        derive_and_validate(opt)

        # Auto output directory (same naming scheme as reference options.py:258-264).
        if opt.output_dir is None or opt.output_dir == "":
            now = datetime.now()
            opt.output_dir = (now.strftime("output/%m-%d-%H:%M-") + opt.dataset
                              + "-g" + str(opt.g_device)[-1]
                              + "-d" + str(opt.d_device)[-1] + "/")
        for path in ["output", opt.output_dir, opt.output_dir + "samples/",
                     opt.output_dir + "saves/", opt.output_dir + "code/"]:
            if not os.path.exists(path):
                os.makedirs(path)

        if opt.manual_seed < 0:
            opt.manual_seed = random.randint(1, 1000000)
        random.seed(opt.manual_seed)
    else:
        loaded_opt = load_opt(opt.resume_path + "opt.txt")
        for arg in opt.keep_args:
            if hasattr(opt, arg):
                setattr(loaded_opt, arg, getattr(opt, arg))
        opt = loaded_opt
        opt.output_dir = opt.resume_path

    return opt


def save_opt(opt, path) -> None:
    """Persist the config as JSON (the reference's opt.txt, train.py:36-38)."""
    with open(path, "w") as f:
        json.dump(opt.__dict__, f)


def load_opt(path) -> Namespace:
    """Load a persisted opt.txt (reference options.py:283-287)."""
    opt = Namespace()
    with open(path, "r") as f:
        opt.__dict__ = json.load(f)
    return opt


def opt_get(opt, name, default=None):
    """Tolerant accessor for optional/new flags on loaded legacy opt.txt files."""
    return getattr(opt, name, default)
