"""Preemption-safe checkpointing: SIGTERM → graceful stop at the next
epoch-group boundary, a full checkpoint (params + optimizer + accountant)
through the normal exit path, exit code 0, and a working `--resume_path`
continuation (training/loop.py `run`). The reference has no equivalent —
its accountant lives only in memory, so any interruption loses the
privacy ledger (SURVEY.md §5.3)."""

import csv
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as train_cli  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _privacy_rows(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [r for r in csv.reader(f) if r and r[0] != "Epoch"]


def test_sigterm_checkpoints_and_resumes(tmp_path):
    out = str(tmp_path / "p")
    # log_every 40 steps = every 10 epochs: bounds the epoch-group dispatch
    # size, so the SIGTERM response latency stays a few seconds on CPU.
    argv = [sys.executable, os.path.join(REPO, "train.py"), "MNIST",
            "-tss", "200", "-bs", "50", "-ne", "100000", "-dpm", "gc",
            "--manual_seed", "2", "--platform", "cpu",
            "--log_every", "40", "--sample_every", "100000",
            "--save_every", "100000", "-o", out]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.Popen(argv, env=env, cwd=str(tmp_path),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    try:
        # wait until real training progress (first privacy-log rows exist)
        deadline = time.time() + 600
        while time.time() < deadline:
            if p.poll() is not None:
                raise AssertionError("train.py exited early:\n"
                                     + p.communicate()[0])
            if len(_privacy_rows(out + "/privacy_log.csv")) >= 2:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("no training progress before deadline")
        p.send_signal(signal.SIGTERM)
        out_text, _ = p.communicate(timeout=300)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0, out_text
    assert "Preempted after epoch" in out_text, out_text
    assert "Finished training." in out_text, out_text

    saves = os.listdir(out + "/saves")
    labels = sorted(int(f.split("-")[1]) for f in saves
                    if f.startswith("G-"))
    assert labels, saves
    n = labels[-1]
    assert os.path.exists(out + f"/saves/D-{n}")
    eps_preempt = float(_privacy_rows(out + "/privacy_log.csv")[-1][1])

    # resume 2 more epochs in-process (conftest pins CPU); epsilon must
    # continue from the preempted run's ledger, not restart at 0.
    train_cli.main(["MNIST", "-rp", out, "-re", str(n), "-ne", str(n + 2),
                    "-ka", "n_epochs"])
    rows = _privacy_rows(out + "/privacy_log.csv")
    assert float(rows[-1][1]) > eps_preempt
    assert os.path.exists(out + f"/saves/G-{n + 2}")
