"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on virtual CPU devices (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).

In the axon TPU environment a sitecustomize hook registers the TPU PJRT
plugin at interpreter start and pins the default platform (overriding the
JAX_PLATFORMS environment variable), and its tunnel supports only one client
at a time — a test suite must not grab it.  ``jax.config.update`` after
import but before first backend use reliably forces the CPU backend.
"""

import os

_TPU_TESTS = os.environ.get("SNAPPY_TPU_TPU_TESTS") == "1"

# XLA flags must be in the environment before the CPU client is created.
flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_TESTS and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not _TPU_TESTS:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

if not _TPU_TESTS:
    # SNAPPY_TPU_TPU_TESTS=1 leaves the real device available for
    # tests/test_tpu_hardware.py (run that file in its own process).
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from snappy_tpu.testing import corpus  # noqa: E402


def require_corpus():
    if corpus.corpus_root() is None:
        pytest.skip("reference corpus not available")


@pytest.fixture
def corpus_root():
    require_corpus()
    return corpus.corpus_root()
