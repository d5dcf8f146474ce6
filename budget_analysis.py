#!/usr/bin/env python
"""Offline epsilon/delta analysis for a saved config (reference
budget_analysis.py:16-80 surface):

    python budget_analysis.py <output_dir> <epochs>

Reads <output_dir>/opt.txt and prints (epsilon, best_alpha) after training
`epochs` epochs on the FULL dataset (60000 MNIST / 202599 CelebA — the
reference intentionally uses the full-set size here rather than
train_set_size, budget_analysis.py:79). The accountant is model-free
(SURVEY.md §3.4), so no model is built.

Note the wider alpha grid vs training ([12..1199] instead of [12..399]) —
an intentional reference difference that is preserved
(budget_analysis.py:39 vs train.py:99).
"""

import argparse

from csl_gan_tpu import options
from csl_gan_tpu.options import opt_get
from csl_gan_tpu.privacy import rdp
from csl_gan_tpu.privacy.accountant import RdpAccountant, ZcdpAccountant


def analyze(opt, epochs: int):
    dataset_size = 60000 if opt.dataset == "MNIST" else 202599
    steps = dataset_size * epochs / opt.batch_size
    if opt.dp_mode in ("tm", "sv"):
        steps_per_epoch = max(1, opt.train_set_size // opt.batch_size)
        acc = ZcdpAccountant(
            rho_per_step=opt_get(opt, "tm_rho_per_epoch", 10) / steps_per_epoch,
            steps=steps)
    else:
        acc = RdpAccountant(batch_size=opt.batch_size,
                            sample_size=opt.train_set_size,
                            noise_multiplier=opt.sigma,
                            alphas=rdp.BUDGET_TOOL_ALPHAS,
                            steps=steps)
    return acc.get_privacy_spent(opt.delta)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str, help="Path to output folder containing opt.txt")
    parser.add_argument("epochs", type=int)
    args = parser.parse_args(argv)

    path = options.add_slash(args.path)
    opt = options.load_opt(path + "opt.txt")
    print(analyze(opt, args.epochs))


if __name__ == "__main__":
    main()
