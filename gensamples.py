#!/usr/bin/env python
"""Generate sample PNGs from a saved generator (reference gensamples.py:7-41):

    python gensamples.py <output_dir> -e <epochs> -n <num_samples> [-bs N]

Writes <output_dir>/G-<epochs>-samples/{1..num_samples}.png. Like the
reference, sampling is unconditional-z only (gensamples.py:36) even for
conditional models — conditional G's get uniform labels so the forward pass
is well-formed (the reference would crash there; do-not-copy list).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from csl_gan_tpu import options
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.training import checkpoint
from csl_gan_tpu.training.steps import TrainStepBuilder
from csl_gan_tpu.utils.images import denorm_celeba, save_image


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str)
    parser.add_argument("-e", "--epochs", type=int, default=-1)
    parser.add_argument("-n", "--num_samples", type=int, default=100)
    parser.add_argument("-bs", "--batch_size", type=int, default=50)
    parser.add_argument("-d", "--device", type=str, default=None,
                        help="JAX platform override (cpu/tpu); the reference's CUDA-device flag mapped to the TPU-native notion. Defaults to the run's saved --platform.")
    args = parser.parse_args(argv)

    from csl_gan_tpu.utils.misc import enable_compilation_cache
    enable_compilation_cache()

    path = options.add_slash(args.path)
    output_dir = path + "G-" + str(args.epochs) + "-samples/"
    os.makedirs(output_dir, exist_ok=True)

    train_opt = options.load_opt(path + "opt.txt")
    if args.device:
        train_opt.platform = args.device
    options.apply_platform(train_opt)
    # abstract: checkpoint loading replaces every leaf, so real weight init
    # is pure waste (and slow over the TPU relay).
    (G, G_vars), (D, D_vars) = init_models(train_opt, abstract=True)
    builder = TrainStepBuilder(train_opt, G, D)
    state = builder.init_state(G_vars, D_vars)
    state, _ = checkpoint.load_g(path + "saves/G-" + str(args.epochs), state)

    key = jax.random.PRNGKey(0)
    # Serving-path phase cache: the checkpoint's params are FIXED across
    # every sampling batch, so the fused upsample-conv kernel collapse
    # (a weight-only transform) runs ONCE here instead of inside every
    # dispatch — the serving analog of --phase_carry. None for models
    # without phase convs.
    pcache = builder.phase_collapse(state.g_params)
    # Full batches are generated (one jit shape), then trimmed to exactly
    # num_samples (the reference drops the remainder: gensamples.py:29).
    n_batches = -(-args.num_samples // args.batch_size)
    count = 0
    for i in range(n_batches):
        kz, ky, key = jax.random.split(jax.random.fold_in(key, i), 3)
        z = builder.gen_z(kz, args.batch_size)
        y = builder.gen_y(ky, args.batch_size)
        imgs = np.asarray(jax.device_get(
            builder.sample_images(state, z, y, pcache)))
        if train_opt.dataset == "CelebA":
            imgs = denorm_celeba(imgs)
        for k in range(imgs.shape[0]):
            if count >= args.num_samples:
                break
            count += 1
            save_image(imgs[k], os.path.join(output_dir, f"{count}.png"))
    print(f"Wrote {count} samples to {output_dir}")


if __name__ == "__main__":
    main()
