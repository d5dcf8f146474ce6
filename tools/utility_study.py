#!/usr/bin/env python
"""CelebA DP utility study: sweep the G-gating operating point.

The reference forces `train_d_until_threshold = -1` for every DP
DeepConvResNet run (reference train.py:122 + options.py override), i.e. G
only trains when the running D adversarial loss drops below -1. With the
reference's CelebA noise level the noised D never reaches that threshold, so
G freezes and FID stops improving (RESULTS.md round-2 run: G Adv Loss = 0
from epoch ~16). This study sweeps

    train_d_until_threshold x n_d_steps

at the flagship DP config, recording per-checkpoint pixel-FID (vs a fixed
dataset sample) and the exact number of G optimizer updates (the Adam step
count carried in each G checkpoint), to find an operating point where G
keeps learning. Run on TPU:

    python tools/utility_study.py -o /tmp/study --tss 20000 --ne 24

Outputs <out>/study.csv (threshold, n_d_steps, epoch, g_updates, pixel_fid)
and a summary table on stdout. Uses synthetic CelebA when no data is on
disk (deterministic, same generator as training).
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cell(out_dir, threshold, n_d_steps, args):
    import train as train_cli
    argv = ["CelebA", "--conditional", "-dpm", "gc", "--bf16", "true",
            "-tss", str(args.tss), "-ne", str(args.ne), "-bs", str(args.bs),
            "-nms", "1", "--mean_sample_size", str(args.mean_sample_size),
            "--manual_seed", str(args.seed),
            "--train_d_until_threshold", str(threshold),
            "--n_d_steps", str(n_d_steps),
            "--save_every", str(args.save_every),
            "--log_every", str(args.tss * args.ne + 1),
            "--sample_every", str(args.tss * args.ne + 1),
            "-o", out_dir]
    if args.im_size:
        argv += ["--im_size", str(args.im_size)]
    if args.platform:
        argv += ["--platform", args.platform]
    if os.path.exists(os.path.join(out_dir, "saves", f"G-{args.ne}")):
        print(f"  (training already complete in {out_dir}, skipping)")
        return
    train_cli.main(argv)


def eval_cell(out_dir, args, real_images):
    """[(epoch, g_updates, pixel_fid)] for every saved G checkpoint."""
    import jax
    import jax.numpy as jnp

    from csl_gan_tpu import options
    from csl_gan_tpu.models.registry import init_models
    from csl_gan_tpu.tools import fid as fid_mod
    from csl_gan_tpu.training import checkpoint
    from csl_gan_tpu.training.steps import TrainStepBuilder

    opt = options.load_opt(os.path.join(out_dir, "opt.txt"))
    (G, _gv), (D, _dv) = init_models(opt, abstract=True)
    builder = TrainStepBuilder(opt, G, D)
    base_state = builder.init_state(_gv, _dv)

    # Denorm to uint8 ON DEVICE before readback: the tunnel moves
    # ~40 MB/s, so the f32 [2048,64,64,3] sample tensor alone was
    # ~2.5 min per checkpoint; uint8 is 4x less and matches the
    # quantization a PNG-file FID pipeline sees anyway.
    @jax.jit
    def _sample_u8(state, z, y):
        im = builder.sample_images(state, z, y)       # [-1, 1]
        return jnp.clip(jnp.round((im + 1.0) * 127.5),
                        0, 255).astype(jnp.uint8)

    rows = []
    for e in sorted(int(f.split("-")[1])
                    for f in os.listdir(os.path.join(out_dir, "saves"))
                    if f.startswith("G-")):
        state, _ = checkpoint.load_g(
            os.path.join(out_dir, "saves", f"G-{e}"), base_state)
        g_updates = int(np.asarray(
            jax.tree_util.tree_leaves(state.g_opt_state)[0]))  # adam count
        imgs = []
        key = jax.random.PRNGKey(1234)
        bs = args.bs
        for i in range(0, args.fid_samples, bs):
            kz, ky, key = jax.random.split(jax.random.fold_in(key, i), 3)
            z = builder.gen_z(kz, bs)
            y = builder.gen_y(ky, bs)
            im = np.asarray(jax.device_get(_sample_u8(state, z, y)))
            imgs.append(im.astype(np.float32) / 255.0)
        fake = np.concatenate(imgs)[:args.fid_samples]
        dist, label = fid_mod.calculate_fid(fake, real_images)
        rows.append((e, g_updates, dist))
        print(f"  epoch {e}: g_updates={g_updates} {label}={dist:.3f}",
              flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--out", required=True)
    p.add_argument("--tss", type=int, default=20000)
    p.add_argument("--ne", type=int, default=24)
    p.add_argument("--bs", type=int, default=128)
    p.add_argument("--im_size", type=int, default=None)
    p.add_argument("--save_every", type=int, default=4)
    p.add_argument("--mean_sample_size", type=int, default=None,
                   help="Per-class mean-sample size; default scales to "
                        "tss/40 (capped at the CelebA default 1000) so "
                        "small smoke runs stay valid.")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--fid_samples", type=int, default=2048)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--thresholds", type=float, nargs="+",
                   default=[-1.0, -0.5, 0.0])
    p.add_argument("--n_d_steps", type=int, nargs="+", default=[5, 1])
    p.add_argument("--skip_train", action="store_true",
                   help="Only (re-)evaluate existing cell outputs.")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    if args.mean_sample_size is None:
        args.mean_sample_size = max(1, min(1000, args.tss // 40))

    # Fixed real-image sample for FID (decoded once; synthetic fallback).
    from csl_gan_tpu import options as opt_mod
    from csl_gan_tpu.data import celeba as celeba_mod
    from csl_gan_tpu.utils.images import denorm_celeba
    ds = celeba_mod.CelebADataset(
        opt_mod.CELEBA_DEFAULTS["data_path"],
        im_size=args.im_size or 64, length=args.tss,
        attr_file=None, attr=None)
    idx = np.random.default_rng(0).choice(len(ds), size=args.fid_samples,
                                          replace=False)
    real = np.stack([ds[i][0] for i in idx])
    real = denorm_celeba(real)
    # match the fake samples' on-device uint8 quantization (see _sample_u8)
    real = np.round(real * 255.0) / 255.0

    results = []
    for t in args.thresholds:
        for k in args.n_d_steps:
            cell = os.path.join(args.out, f"t{t}_k{k}")
            print(f"=== threshold={t} n_d_steps={k} -> {cell}", flush=True)
            if not args.skip_train:
                run_cell(cell, t, k, args)
            for e, gu, dist in eval_cell(cell, args, real):
                results.append((t, k, e, gu, dist))

    with open(os.path.join(args.out, "study.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["threshold", "n_d_steps", "epoch", "g_updates",
                    "pixel_fid"])
        w.writerows(results)

    print("\nthreshold  n_d_steps  final_epoch  g_updates  pixel_fid")
    for t in args.thresholds:
        for k in args.n_d_steps:
            rows = [r for r in results if r[0] == t and r[1] == k]
            if rows:
                r = max(rows, key=lambda r: r[2])
                print(f"{t:9} {k:10} {r[2]:12} {r[3]:10} {r[4]:10.3f}")


if __name__ == "__main__":
    main()
