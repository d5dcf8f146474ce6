#!/usr/bin/env python
"""Membership-inference attack + FID evaluation (reference
mem_inf_attack.py:29-449):

    python mem_inf_attack.py --model_dir <dir> --model_name <name> \
        --checkpoints N [N...] [--compute_fid] [--generate_samples] [--save]

Per checkpoint: the Hayes et al. 2018 sort-by-discriminator-value attack
(ASR over random train/nontrain subsets), optional sample generation to
PNGs, optional FID between real training data and generated samples, and a
JSON stats dump.

vs the reference: the ASR core is actually executed (the reference's is
commented out, mem_inf_attack.py:319-350), its undefined-variable path bugs
are fixed (SURVEY.md §7), and FID uses the built-in extractor (canonical
Inception features when $FID_INCEPTION_WEIGHTS is set, pixel features
otherwise — see csl_gan_tpu/tools/fid.py).
"""

import argparse
import json
import os
import shutil
import uuid

import jax
import jax.numpy as jnp
import numpy as np

from csl_gan_tpu import options as csl_options
from csl_gan_tpu.data import init_data
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.tools import fid as fid_mod
from csl_gan_tpu.training import checkpoint
from csl_gan_tpu.training.steps import TrainStepBuilder
from csl_gan_tpu.utils.images import denorm_celeba, save_image


def attack(attack_values_train, attack_values_nontrain, data_prop=0.1,
           rng=None) -> float:
    """Hayes et al. 2018: given a pool of which data_prop are training
    samples, sort by attack value and take the top n; ASR = precision
    (reference mem_inf_attack.py:29-59)."""
    rng = np.random.default_rng() if rng is None else rng
    n = int(1000 * data_prop)
    m = int(1000 * (1 - data_prop))
    sub_train = rng.choice(attack_values_train, size=n, replace=False)
    sub_non = rng.choice(attack_values_nontrain, size=m, replace=False)
    values = np.concatenate([sub_train, sub_non])
    indicators = np.concatenate([np.ones(n), np.zeros(m)])
    order = np.argsort(-values)
    return float(np.mean(indicators[order[:n]]))


def apply_discriminator(dataset_kind, builder, state, loader):
    """D-derived attack values: MNIST = softmax-max of the aux head
    (mem_inf_attack.py:69-84); CelebA = raw critic value (:87-101)."""
    values = []
    for x, y in loader:
        x = jnp.asarray(x)
        yy = jnp.asarray(y) if builder.conditional else None
        out, aux = builder.D.apply({"params": state.d_params}, x, yy)
        if dataset_kind == "MNIST" and aux is not None:
            v = jnp.max(jax.nn.softmax(aux, axis=1), axis=1)
        else:
            v = out.reshape(out.shape[0])
        values.append(np.asarray(jax.device_get(v)))
    return np.concatenate(values)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--asr_iters", type=int, default=10000)
    parser.add_argument("--batch_size", type=int, default=1000)
    parser.add_argument("--compute_fid", default=False, action="store_true")
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--labels_dir", type=str, default=None)
    parser.add_argument("--data_prop", type=float, default=0.1)
    parser.add_argument("--fid_dir", type=str, default="fid/")
    parser.add_argument("--generate_samples", default=False, action="store_true")
    parser.add_argument("--checkpoint_max", type=int, default=None)
    parser.add_argument("--checkpoint_min", type=int, default=None)
    parser.add_argument("--checkpoint_step", type=int, default=None)
    parser.add_argument("--checkpoints", type=int, nargs="+", default=None)
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--num_generated_samples", type=int, default=2048)
    parser.add_argument("--outputs_dir", type=str, default="outputs/")
    parser.add_argument("--public_set_size", type=int, default=10000)
    parser.add_argument("--real_samples_dir", type=str, default="real_samples_dir/")
    parser.add_argument("--samples_dir", type=str, default="samples/")
    parser.add_argument("--save", default=False, action="store_true")
    parser.add_argument("--tmp_dir", type=str, default="tmp/")
    parser.add_argument("--train_set_size", type=int, default=None)
    parser.add_argument("--values_dir", type=str, default="values/")
    parser.add_argument("--skip_asr", default=False, action="store_true")
    args = parser.parse_args(argv)

    run_id = uuid.uuid4().hex
    if all(v is not None for v in [args.checkpoint_max, args.checkpoint_min,
                                   args.checkpoint_step]) and \
            args.checkpoint_max > args.checkpoint_min > 0:
        args.checkpoints = list(range(args.checkpoint_min,
                                      args.checkpoint_max + args.checkpoint_step,
                                      args.checkpoint_step))
    if not args.checkpoints:
        raise ValueError("No checkpoints specified")

    model_path = os.path.join(args.model_dir, args.model_name)
    opt = csl_options.load_opt(os.path.join(model_path, "opt.txt"))
    csl_options.apply_platform(opt)
    if args.data_dir:
        opt.data_path = csl_options.add_slash(args.data_dir)
    if args.labels_dir:
        opt.label_path = args.labels_dir
    opt.public_set_size = args.public_set_size
    if args.train_set_size is not None:
        opt.train_set_size = args.train_set_size

    print(f"Loading data for {args.model_name}...")
    train_dataset, train_loader, nontrain_dataset, nontrain_loader = init_data(opt)

    # abstract: each checkpoint load below replaces every leaf.
    (G, G_vars), (D, D_vars) = init_models(opt, abstract=True)
    builder = TrainStepBuilder(opt, G, D)
    base_state = builder.init_state(G_vars, D_vars)

    # Real-data PNGs for FID (mem_inf_attack.py:261-273).
    real_dir = None
    if args.compute_fid:
        real_dir = os.path.join(args.tmp_dir, args.real_samples_dir,
                                opt.dataset.lower())
        os.makedirs(real_dir, exist_ok=True)
        if len(os.listdir(real_dir)) == 0:
            print("Saving real training data PNGs...")
            imgs, _ = train_dataset.materialize(
                range(min(len(train_dataset), args.num_generated_samples)))
            if opt.dataset == "CelebA":
                imgs = denorm_celeba(imgs)
            for i in range(len(imgs)):
                save_image(imgs[i], os.path.join(real_dir, f"{i:06d}.png"))

    json_path = os.path.join(args.outputs_dir, f"{args.model_name}.json")
    checkpoint_stats = {}
    if os.path.exists(json_path):
        with open(json_path) as f:
            checkpoint_stats = json.load(f)

    rng = np.random.default_rng(0)
    for ckpt in args.checkpoints:
        if str(ckpt) in checkpoint_stats:
            continue
        checkpoint_stats[ckpt] = {}
        state, _ = checkpoint.load_g(
            os.path.join(model_path, "saves", f"G-{ckpt}"), base_state)
        state, _, _ = checkpoint.load_d(
            os.path.join(model_path, "saves", f"D-{ckpt}"), state)
        print(f"Loaded checkpoint {ckpt}")

        if not args.skip_asr:
            v_train = apply_discriminator(opt.dataset, builder, state, train_loader)
            v_non = apply_discriminator(opt.dataset, builder, state, nontrain_loader)
            asrs = [attack(v_train, v_non, args.data_prop, rng)
                    for _ in range(args.asr_iters)]
            asr = float(np.mean(asrs))
            checkpoint_stats[ckpt]["asr"] = asr
            print(f"ASR on {args.model_name}-{ckpt}: {asr:.2%}")

        fake_dir = None
        if args.generate_samples or args.compute_fid:
            n = args.num_generated_samples
            if opt.conditional:
                per = n // opt.n_classes + 1
                y_all = np.concatenate([np.full(per, c) for c in range(opt.n_classes)])
                n = len(y_all)
            else:
                y_all = None
            key = jax.random.PRNGKey(1)
            fake_dir = os.path.join(args.samples_dir, args.model_name,
                                    f"G-{ckpt}", run_id)
            os.makedirs(fake_dir, exist_ok=True)
            count = 0
            # Phase cache once per checkpoint (serving-path --phase_carry
            # analog; params are fixed across the sampling batches).
            pcache = builder.phase_collapse(state.g_params)
            for i in range(0, n, args.batch_size):
                bs = min(args.batch_size, n - i)
                z = builder.gen_z(jax.random.fold_in(key, i), bs)
                yi = None if y_all is None else jnp.asarray(y_all[i:i + bs])
                imgs = np.asarray(jax.device_get(
                    builder.sample_images(state, z, yi, pcache)))
                if opt.dataset == "CelebA":
                    imgs = denorm_celeba(imgs)
                for k in range(len(imgs)):
                    save_image(imgs[k], os.path.join(fake_dir, f"{count:04d}.png"))
                    count += 1
            print(f"Generated {count} samples.")

        if args.compute_fid:
            fid, label = fid_mod.calculate_fid_given_paths(
                (real_dir, fake_dir), 50)
            checkpoint_stats[ckpt][label] = fid
            print(f"Computed {label}: {fid:.2f}")
            fid_filedir = os.path.join(args.values_dir, args.fid_dir,
                                       args.model_name, f"G-{ckpt}")
            os.makedirs(fid_filedir, exist_ok=True)
            with open(os.path.join(fid_filedir, "fid.txt"), "w") as f:
                f.write(str(fid))

        if args.generate_samples and fake_dir:
            assert not fake_dir.startswith("/")
            shutil.rmtree(fake_dir, ignore_errors=True)

    print(json.dumps(checkpoint_stats, indent=4))
    if args.save:
        os.makedirs(args.outputs_dir, exist_ok=True)
        with open(json_path, "w") as f:
            json.dump(checkpoint_stats, f)
        print("Saved", json_path)


if __name__ == "__main__":
    main()
