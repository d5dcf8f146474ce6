"""Test configuration: force an 8-device virtual CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4: the CPU mesh
is the "fake backend" the reference never had). The real-TPU path is exercised
by bench.py / __graft_entry__.py, not the unit suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU backend and
# overwrites jax_platforms; re-pin to CPU after import (works because no
# backend has been initialized yet at conftest time).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _restore_prng_impl():
    """train.py's CLI main flips the global default PRNG impl to rbg
    (production default); restore it after every test so raw threefry keys
    created by later tests keep working (keys never cross test boundaries,
    so mid-test flips are safe)."""
    prev = jax.config.jax_default_prng_impl
    yield
    jax.config.update("jax_default_prng_impl", prev)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_out(tmp_path):
    out = tmp_path / "out"
    for sub in ["", "samples", "saves", "code"]:
        (out / sub).mkdir(parents=True, exist_ok=True)
    return str(out) + "/"


def make_opt(tmp_dir, *argv):
    """Parse options with an output dir inside tmp."""
    from csl_gan_tpu import options
    return options.parse(list(argv) + ["-o", tmp_dir, "--manual_seed", "1234"])
