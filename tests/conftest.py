"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on virtual CPU devices (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).  Must run before jax
is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

from snappy_tpu.testing import corpus  # noqa: E402


def require_corpus():
    if corpus.corpus_root() is None:
        pytest.skip("reference corpus not available")


@pytest.fixture
def corpus_root():
    require_corpus()
    return corpus.corpus_root()
