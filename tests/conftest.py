"""Test harness config.

Tests run on a virtual 8-device CPU mesh (the reference tests concurrency by
running real goroutine engines under -race with varying -cpu; we test the
sharded engines by running the real pjit/shard_map code over fake devices).
Must be set before JAX is imported anywhere.
"""

import os

# Force CPU even when the ambient environment points at the tunneled TPU —
# tests never consume real-chip time; bench.py is the only real-chip user.
# The axon sitecustomize imports jax at interpreter startup, so the env var
# alone is too late: override via jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

TESTDATA = pathlib.Path("/root/reference/testdata")


@pytest.fixture(scope="session")
def testdata():
    return TESTDATA


def corpus_files():
    """The reference's shared test corpus (SURVEY.md §4 fixtures)."""
    return sorted(TESTDATA.glob("*.txt")) + [TESTDATA / "sharnd.out", TESTDATA / "pngdata.bin"]


@pytest.fixture(scope="session", params=[p.name for p in corpus_files()])
def corpus_file(request):
    return TESTDATA / request.param
