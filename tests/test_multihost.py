"""Multi-process (DCN) training: the --multihost surface.

Two OS processes x 4 virtual CPU devices each run the real train.py CLI with
--multihost (jax.distributed over a localhost coordinator — the same
mechanism as cross-host DCN on TPU pods, SURVEY.md §5.8); the resulting
process-0 checkpoint must match a single-process 8-device run of the
identical config (same global mesh size, same seeds).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as train_cli  # noqa: E402
from csl_gan_tpu import options  # noqa: E402
from csl_gan_tpu.models.registry import init_models  # noqa: E402
from csl_gan_tpu.training import checkpoint  # noqa: E402
from csl_gan_tpu.training.steps import TrainStepBuilder  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = ["MNIST", "-tss", "96", "-ne", "1", "-bs", "24", "--manual_seed", "5",
        "-dpm", "gc", "--conditional", "--log_every", "100000",
        "--sample_every", "100000", "--save_every", "1", "--sample_num", "4"]


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _load_params(out_dir, argv):
    opt = options.parse(argv + ["-o", out_dir + "_load"])
    (G, Gv), (D, Dv) = init_models(opt, abstract=True)
    builder = TrainStepBuilder(opt, G, D)
    state = builder.init_state(Gv, Dv)
    state, _ = checkpoint.load_g(os.path.join(out_dir, "saves", "G-1"), state)
    state, _, _ = checkpoint.load_d(os.path.join(out_dir, "saves", "D-1"),
                                    state)
    return state


def test_multihost_matches_single_process(tmp_path):
    port = _free_port()
    mh_out = str(tmp_path / "mh")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count=4")
        env["XLA_FLAGS"] = " ".join(flags)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        argv = [sys.executable, os.path.join(REPO, "train.py"), *BASE,
                "--platform", "cpu", "--multihost", "true",
                "--coordinator_address", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid),
                "-o", mh_out]
        procs.append(subprocess.Popen(argv, env=env, cwd=str(tmp_path),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost process timed out")
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"process {pid} failed:\n{out[-4000:]}"
    assert os.path.exists(os.path.join(mh_out, "saves", "G-1"))

    # Identical config, single process over the same 8 virtual devices
    # (this pytest process — conftest forces the 8-device CPU mesh).
    ref_out = str(tmp_path / "ref")
    train_cli.main(BASE + ["-o", ref_out])

    mh = _load_params(mh_out, BASE)
    ref = _load_params(ref_out, BASE)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(mh.g_params),
                    jax.tree_util.tree_leaves(ref.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(mh.d_params),
                    jax.tree_util.tree_leaves(ref.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
