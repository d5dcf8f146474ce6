#!/usr/bin/env python
"""Convert a reference (torch) training output directory to this framework.

    python convert_reference_checkpoint.py <ref_output_dir> -o <out_dir> \
        [-e EPOCH [EPOCH ...]]

Reads the reference's ``opt.txt`` + ``saves/{G|D}-N`` torch pickles
(reference util.py:16-22: {epoch, model_state_dict, optimizer_state_dict,
loss}) and writes an equivalent output directory in this framework's
msgpack layout, so every rebuilt tool (gensamples.py, temp_file.py,
downstream.py, mem_inf_attack.py, budget_analysis.py, --resume_path) can
evaluate models trained by the original code. Layout/naming transforms live
in csl_gan_tpu/training/ref_convert.py; converted-G functional exactness
(including the reference's channel-scrambling pixel-shuffle upsampling) is
pinned by tests/test_ref_convert.py against the torch modules themselves.

The written opt.txt sets ``ref_pixel_shuffle`` for DCResNet configs (the
converted conv weights expect the reference's upsampling arrangement) and
the D checkpoints carry a reconstructed accountant state
(steps = epoch * batches/epoch — the reference itself loses accountant
state on save, SURVEY.md §5.3, so this is the same reconstruction its
budget_analysis.py performs).
"""

import argparse
import glob
import os
import re
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ref_dir", help="reference training output dir "
                                    "(opt.txt + saves/{G|D}-N)")
    ap.add_argument("-o", "--output_dir", required=True)
    ap.add_argument("-e", "--epochs", type=int, nargs="*", default=None,
                    help="checkpoint labels to convert; default: all found")
    args = ap.parse_args(argv)

    import jax  # deferred: keep --help fast
    from flax import serialization
    import torch

    from csl_gan_tpu import options
    from csl_gan_tpu.models.registry import init_models
    from csl_gan_tpu.privacy import make_accountant
    from csl_gan_tpu.training import checkpoint, ref_convert
    from csl_gan_tpu.training.steps import TrainStepBuilder

    opt = options.load_opt(os.path.join(args.ref_dir, "opt.txt"))
    if opt.model == "DeepConvResNet":
        # Converted conv weights bake in the reference's channel-scrambled
        # pixel-shuffle upsampling; run the G with exactly that.
        opt.ref_pixel_shuffle = True

    (G, G_vars), (D, D_vars) = init_models(opt)
    builder = TrainStepBuilder(opt, G, D)
    state_tmpl = builder.init_state(G_vars, D_vars)

    g_map = ref_convert.g_key_map(opt, G)
    g_stats = ref_convert.g_stats_map(opt, G)
    d_map = ref_convert.d_key_map(opt, D)

    saves_in = os.path.join(args.ref_dir, "saves")
    if args.epochs:
        labels = list(args.epochs)
    else:
        labels = sorted(int(m.group(1)) for f in glob.glob(
            os.path.join(saves_in, "G-*"))
            if (m := re.fullmatch(r"G-(\d+)", os.path.basename(f))))
    if not labels:
        sys.exit(f"no saves/G-N checkpoints found under {saves_in}")

    os.makedirs(os.path.join(args.output_dir, "saves"), exist_ok=True)
    # The output opt.txt: the reference config plus the interop flag; tools
    # read it exactly like a native training output's.
    options.save_opt(opt, os.path.join(args.output_dir, "opt.txt"))

    spe = max(1, int(opt.train_set_size // opt.batch_size))
    for label in labels:
        gpath = os.path.join(saves_in, f"G-{label}")
        dpath = os.path.join(saves_in, f"D-{label}")
        # weights_only: the reference pickles hold only tensors/ints.
        g_ckpt = torch.load(gpath, map_location="cpu", weights_only=True)
        g_params, g_bstats = ref_convert.convert_model_state(
            g_ckpt["model_state_dict"], g_map, state_tmpl.g_params,
            g_stats, state_tmpl.g_batch_stats)
        g_opt_sd = ref_convert.convert_adam_state(
            g_ckpt.get("optimizer_state_dict"), g_map, state_tmpl.g_opt_state)

        state = state_tmpl.replace(
            g_params=serialization.from_state_dict(state_tmpl.g_params,
                                                   g_params),
            g_batch_stats=(serialization.from_state_dict(
                state_tmpl.g_batch_stats, g_bstats)
                if g_bstats is not None else state_tmpl.g_batch_stats),
            g_opt_state=(serialization.from_state_dict(
                state_tmpl.g_opt_state, g_opt_sd)
                if g_opt_sd is not None else state_tmpl.g_opt_state))

        epoch = int(g_ckpt.get("epoch", label - 1))
        acc_state = None
        if os.path.exists(dpath):
            d_ckpt = torch.load(dpath, map_location="cpu", weights_only=True)
            d_params, _ = ref_convert.convert_model_state(
                d_ckpt["model_state_dict"], d_map, state_tmpl.d_params)
            d_opt_sd = ref_convert.convert_adam_state(
                d_ckpt.get("optimizer_state_dict"), d_map,
                state_tmpl.d_opt_state)
            state = state.replace(
                d_params=serialization.from_state_dict(state_tmpl.d_params,
                                                       d_params),
                d_opt_state=(serialization.from_state_dict(
                    state_tmpl.d_opt_state, d_opt_sd)
                    if d_opt_sd is not None else state_tmpl.d_opt_state))
            if opt.use_dp:
                acc = make_accountant(opt)
                acc.step(label * spe)
                acc_state = acc.state_dict()
        checkpoint.save_g(os.path.join(args.output_dir, "saves", f"G-{label}"),
                          epoch, state)
        if os.path.exists(dpath):
            checkpoint.save_d(os.path.join(args.output_dir, "saves",
                                           f"D-{label}"),
                              epoch, state, acc_state)
        print(f"converted G-{label}" +
              (f" + D-{label}" if os.path.exists(dpath) else " (no D)"))
    print(f"wrote {args.output_dir} ({len(labels)} checkpoint(s))")


if __name__ == "__main__":
    main()
