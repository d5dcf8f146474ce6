"""End-to-end CLI tests for the evaluation tool suite (SURVEY.md C16-C20),
run against a tiny real training output on CPU."""

import csv
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import budget_analysis  # noqa: E402
import downstream  # noqa: E402
import gensamples  # noqa: E402
import mem_inf_attack  # noqa: E402
import temp_file  # noqa: E402
import train as train_cli  # noqa: E402


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tools") / "run")
    train_cli.main(["MNIST", "--conditional", "-dpm", "gc", "-tss", "200",
                    "-ne", "1", "-bs", "50", "--manual_seed", "12",
                    "--log_every", "200", "--sample_every", "100000",
                    "--save_every", "1", "-o", out])
    return out + "/"


def test_budget_analysis_cli(run_dir, capsys):
    budget_analysis.main([run_dir, "3"])
    out = capsys.readouterr().out
    eps, alpha = eval(out.strip())
    assert np.isfinite(eps) and eps > 0 and alpha > 1


def test_budget_analysis_matches_training_accounting(run_dir):
    from csl_gan_tpu import options
    from csl_gan_tpu.privacy import RdpAccountant
    opt = options.load_opt(run_dir + "opt.txt")
    eps_tool, _ = budget_analysis.analyze(opt, 3)
    # training accountant at the equivalent step count (full-set convention)
    acc = RdpAccountant(opt.batch_size, opt.train_set_size, opt.sigma)
    acc.steps = 60000 * 3 / opt.batch_size
    eps_train, _ = acc.get_privacy_spent(opt.delta)
    assert eps_tool == pytest.approx(eps_train, rel=1e-6)


def test_gensamples_cli(run_dir):
    gensamples.main([run_dir, "-e", "1", "-n", "6", "-bs", "3"])
    outdir = run_dir + "G-1-samples/"
    assert len(os.listdir(outdir)) == 6


def test_gensamples_remainder(run_dir):
    """num_samples not a multiple of batch_size writes exactly num_samples
    (the reference drops the remainder batch, gensamples.py:29)."""
    gensamples.main([run_dir, "-e", "1", "-n", "7", "-bs", "3"])
    assert len(os.listdir(run_dir + "G-1-samples/")) == 7
    gensamples.main([run_dir, "-e", "1", "-n", "2", "-bs", "5"])
    assert len(os.listdir(run_dir + "G-1-samples/")) == 7  # 2 < 7 files kept


def test_temp_file_cli(run_dir, capsys):
    temp_file.main([run_dir, "-e", "1"])
    assert "Loaded epoch" in capsys.readouterr().out


def test_downstream_cli(run_dir):
    downstream.main([run_dir, "-e", "1", "-n", "300", "-bs", "100"])
    with open(run_dir + "downstream_log.csv") as f:
        rows = [r for r in csv.reader(f) if r]
    assert rows[-1][0] == "1"
    assert 0.0 <= float(rows[-1][1]) <= 1.0


def test_mem_inf_attack_cli(run_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    model_dir, model_name = os.path.split(run_dir.rstrip("/"))
    mem_inf_attack.main(["--model_dir", model_dir, "--model_name", model_name,
                         "--checkpoints", "1", "--asr_iters", "20",
                         "--batch_size", "100", "--generate_samples",
                         "--compute_fid", "--num_generated_samples", "60",
                         "--train_set_size", "200", "--public_set_size", "200",
                         "--save"])
    with open(tmp_path / "outputs" / f"{model_name}.json") as f:
        stats = json.load(f)
    entry = stats["1"]
    assert 0.0 <= entry["asr"] <= 1.0
    assert np.isfinite(entry["pixel_fid"])
