"""Config system parity tests (reference options.py semantics)."""

import json

import pytest

from csl_gan_tpu import options


def parse(tmp_path, *argv):
    return options.parse(list(argv) + ["-o", str(tmp_path / "out"), "--manual_seed", "99"])


def test_mnist_defaults(tmp_path):
    opt = parse(tmp_path, "MNIST")
    assert opt.batch_size == 600
    assert opt.sigma == 5.0
    assert opt.delta == 1e-5
    assert opt.clipping_param == 4.0
    assert opt.model == "Vanilla"
    assert opt.n_classes == 10
    assert opt.g_lr == 0.0002
    assert opt.penalty == []


def test_celeba_defaults(tmp_path):
    opt = parse(tmp_path, "CelebA", "-nms", "1")
    assert opt.batch_size == 128
    assert opt.sigma == 0.5
    assert opt.delta == 1e-6
    assert opt.model == "DeepConvResNet"
    assert opt.penalty == ["WGAN-GP"]
    assert opt.clipping_param_per_layer == [1000, 200, 1000, 100, 1000, 100, 1000, 5, 2500]
    assert opt.n_d_steps == 5
    assert opt.adam_b1 == 0.0


def test_derived_flags(tmp_path):
    opt = parse(tmp_path, "MNIST", "-dpm", "gc", "--conditional")
    assert opt.use_dp and opt.per_sample_grad
    assert opt.is_acgan and opt.use_aux_loss
    opt2 = parse(tmp_path, "MNIST", "-dpm", "is")
    assert opt2.use_dp and not opt2.per_sample_grad


def test_interval_rounding(tmp_path):
    # log_every 100000 >= train_set_size 60000 -> epoch units; rounded to batch.
    opt = parse(tmp_path, "MNIST")
    assert opt.log_every_epochs == 1
    assert opt.log_every % opt.batch_size == 0
    assert opt.sample_every % opt.batch_size == 0


def test_wcgan_disables_aux_penalty(tmp_path):
    opt = parse(tmp_path, "MNIST", "--conditional", "--conditional_arch", "WCGAN")
    assert opt.aux_penalty is False


def test_dcresnet_dp_forces_threshold(tmp_path):
    opt = parse(tmp_path, "CelebA", "-dpm", "gc", "-nms", "1")
    assert opt.train_d_until_threshold == -1


def test_validation_public_and_mean_samples_conflict(tmp_path):
    with pytest.raises(Exception, match="only one"):
        parse(tmp_path, "MNIST", "-pss", "100", "-nms", "4")


def test_validation_penalty_needs_public_data(tmp_path):
    with pytest.raises(Exception, match="mean sampling"):
        parse(tmp_path, "CelebA", "-dpm", "gc")


def test_validation_vanilla_embed(tmp_path):
    with pytest.raises(Exception, match="Vanilla"):
        parse(tmp_path, "MNIST", "--g_label_emb_mode", "embed")


def test_is_per_param_scaling_conflict(tmp_path):
    with pytest.raises(Exception, match="per parameter"):
        parse(tmp_path, "MNIST", "-dpm", "is", "-ispp", "true", "-issm", "constant-pl")


def test_opt_txt_roundtrip(tmp_path):
    opt = parse(tmp_path, "MNIST", "-dpm", "gc")
    p = tmp_path / "opt.txt"
    options.save_opt(opt, str(p))
    loaded = options.load_opt(str(p))
    assert loaded.__dict__ == opt.__dict__


def test_resume_merge(tmp_path):
    opt = parse(tmp_path, "MNIST", "-dpm", "gc")
    options.save_opt(opt, opt.output_dir + "opt.txt")
    resumed = options.parse(["MNIST", "-rp", opt.output_dir, "-re", "5",
                             "-nw", "3"])
    assert resumed.batch_size == opt.batch_size
    assert resumed.resume_epochs == 5          # always-keep list
    assert resumed.num_workers == 3            # always-keep list
    assert resumed.output_dir == opt.output_dir


def test_fill_defaults_none_false_quirk(tmp_path):
    # Reference quirk: fill_defaults overwrites False values too
    # (options.py:93-96) — document-by-test.
    from argparse import Namespace
    ns = Namespace(a=None, b=False, c=0, d="set")
    options.fill_defaults(ns, {"a": 1, "b": 2, "c": 3, "d": 4})
    assert (ns.a, ns.b, ns.c, ns.d) == (1, 2, 0, "set")
