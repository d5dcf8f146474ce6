#!/usr/bin/env python
"""Training CLI — same surface as reference train.py:

    python train.py MNIST|CelebA [flags]

See `python train.py --help` for the full flag set (reference options.py
parity plus TPU extensions: --mesh_shape, --per_sample_chunk, --platform).
"""

import jax

from csl_gan_tpu import options
from csl_gan_tpu.training.loop import run_training


def main(argv=None):
    opt = options.parse(argv)
    platform = getattr(opt, "platform", None)
    if platform:
        jax.config.update("jax_platforms", platform)
    run_training(opt)


if __name__ == "__main__":
    main()
