#!/usr/bin/env python
"""Checkpoint smoke-loader (reference temp_file.py:1-31): load G and D from a
save and run one composed D(G(z, y), y) forward.

    python temp_file.py <output_dir> -e <epochs>
"""

import argparse

import jax
import numpy as np

from csl_gan_tpu import options
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.training import checkpoint
from csl_gan_tpu.training.steps import TrainStepBuilder


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str, help="Path to the output folder")
    parser.add_argument("-e", "--epochs", type=int, default=-1)
    parser.add_argument("-d", "--device", type=str, default=None,
                        help="JAX platform override (cpu/tpu); the reference's CUDA-device flag mapped to the TPU-native notion. Defaults to the run's saved --platform.")
    args = parser.parse_args(argv)

    path = options.add_slash(args.path)
    train_opt = options.load_opt(path + "opt.txt")
    if args.device:
        train_opt.platform = args.device
    options.apply_platform(train_opt)

    # abstract: the G/D checkpoints replace every leaf below.
    (G, G_vars), (D, D_vars) = init_models(train_opt, abstract=True)
    builder = TrainStepBuilder(train_opt, G, D)
    state = builder.init_state(G_vars, D_vars)
    state, _ = checkpoint.load_g(path + "saves/G-" + str(args.epochs), state)
    state, epoch, _ = checkpoint.load_d(path + "saves/D-" + str(args.epochs), state)

    key = jax.random.PRNGKey(0)
    kz, ky = jax.random.split(key)
    z = builder.gen_z(kz, 1)
    y = builder.gen_y(ky, 1)
    img = builder.sample_images(state, z, y)
    out, aux = D.apply({"params": state.d_params}, img, y)
    print("Loaded epoch", epoch, "| D(G(z,y),y) =", np.asarray(out).ravel())


if __name__ == "__main__":
    main()
