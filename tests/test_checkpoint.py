"""Checkpoint/resume tests — including accountant state restoration
(the reference loses it on resume, SURVEY.md §5.3)."""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as train_cli  # noqa: E402
from csl_gan_tpu import options  # noqa: E402
from csl_gan_tpu.models.registry import init_models  # noqa: E402
from csl_gan_tpu.privacy import RdpAccountant  # noqa: E402
from csl_gan_tpu.training import checkpoint  # noqa: E402
from csl_gan_tpu.training.steps import TrainStepBuilder  # noqa: E402


def test_save_load_roundtrip(tmp_path):
    opt = options.parse(["MNIST", "-dpm", "gc", "-o", str(tmp_path / "o"),
                         "--manual_seed", "5", "-bs", "16"])
    (G, Gv), (D, Dv) = init_models(opt)
    builder = TrainStepBuilder(opt, G, D)
    state = builder.init_state(Gv, Dv)

    # advance one step so opt state is non-trivial
    x = jax.random.uniform(jax.random.PRNGKey(0), (16, 28, 28, 1))
    state, _ = builder.d_step_dp(state, x, None, x, None, x, None,
                                 jax.random.PRNGKey(1))

    acc = RdpAccountant(16, 200, 5.0)
    acc.step(42)
    checkpoint.save_pair(opt.output_dir, 7, 6, state, acc.state_dict())

    state2 = builder.init_state(Gv, Dv)
    state2, _ = checkpoint.load_g(opt.output_dir + "saves/G-7", state2)
    state2, epoch, acc_state = checkpoint.load_d(opt.output_dir + "saves/D-7", state2)
    assert epoch == 6
    assert acc_state["steps"] == 42
    for a, b in zip(jax.tree_util.tree_leaves(state.d_params),
                    jax.tree_util.tree_leaves(state2.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.d_opt_state),
                    jax.tree_util.tree_leaves(state2.d_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_cli_continues_accountant(tmp_path):
    out = str(tmp_path / "r")
    args = ["MNIST", "-tss", "200", "-bs", "50", "--manual_seed", "2",
            "--log_every", "100000", "--sample_every", "100000",
            "--save_every", "1", "-dpm", "gc"]
    train_cli.main(args + ["-ne", "2", "-o", out])
    import csv
    with open(out + "/privacy_log.csv") as f:
        eps_first = float(list(csv.reader(f))[-1][1])

    # resume for 2 more epochs (n_epochs must be kept via -ka, reference
    # options.py:128-131); epsilon must continue increasing from eps_first
    train_cli.main(["MNIST", "-rp", out, "-re", "2", "-ne", "4",
                    "-ka", "n_epochs"])
    with open(out + "/privacy_log.csv") as f:
        rows = [r for r in csv.reader(f) if r and r[0] != "Epoch"]
    eps_last = float(rows[-1][1])
    assert eps_last > eps_first
    assert os.path.exists(out + "/saves/G-4")
