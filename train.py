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
    options.apply_platform(opt)
    if getattr(opt, "rbg", True):
        # XLA RngBitGenerator keys: 1.32x the MNIST DP epoch vs threefry
        # (the 6-way key split per scan step is launch-bound work;
        # RESULTS.md). Quality parity note: the reference's DP noise comes
        # from torch's standard Philox generator — the same PRNG family.
        # --rbg false restores JAX's default threefry streams.
        jax.config.update("jax_default_prng_impl", "rbg")
    from csl_gan_tpu.utils.misc import enable_compilation_cache
    enable_compilation_cache()
    if getattr(opt, "multihost", False):
        # Must run before any backend use. On TPU pods all three args
        # auto-detect; for manual/CPU clusters pass them explicitly.
        kwargs = {k: getattr(opt, k) for k in
                  ("coordinator_address", "num_processes", "process_id")
                  if getattr(opt, k, None) is not None}
        jax.distributed.initialize(**kwargs)
        if jax.process_index() != 0:
            # Only process 0's output dir is authoritative; other processes
            # run the identical program but write to scratch (the simplest
            # correct gating — every write site stays single-process-clean).
            import tempfile
            opt.output_dir = options.add_slash(
                tempfile.mkdtemp(prefix="csl_gan_scratch_"))
            for sub in ["samples", "saves", "code"]:
                import os
                os.makedirs(opt.output_dir + sub, exist_ok=True)
    run_training(opt)


if __name__ == "__main__":
    main()
