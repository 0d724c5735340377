"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py uses the real chip).
"""

import os
import pathlib

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel) and a sitecustomize imports jax before this file runs, so the
# env var alone is not enough — update the live jax config too.
# Correctness tests must not round-trip the network per dispatch.
# stash the ambient platform for the tunnel-gated TPU smoke test
os.environ.setdefault(
    "PSI_AMBIENT_JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

#: Reference test data (tiny/small/multi graphs + reads). Read-only mount.
TEST_DATA_DIR = pathlib.Path(
    os.environ.get("PSI_TEST_DATA", "/root/reference/test/data")
)


@pytest.fixture(scope="session")
def data_dir():
    if not TEST_DATA_DIR.exists():
        pytest.skip("reference test data not available")
    return TEST_DATA_DIR


def require_data():
    return pytest.mark.skipif(
        not TEST_DATA_DIR.exists(), reason="reference test data not available"
    )
