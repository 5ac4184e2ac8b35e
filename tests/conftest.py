"""Test configuration: force a virtual 8-device CPU mesh.

This is the TPU analog of "test multi-node without a cluster" (SURVEY.md §4):
all sharding/pjit/shard_map tests run against 8 virtual CPU devices via
``--xla_force_host_platform_device_count=8``.

Note: some installed pytest plugins import jax before this conftest runs, so
setting os.environ alone is not enough — the jax config option must be updated
directly (the backend itself initializes lazily, so this is still in time).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against float64-ish torch/numpy references; keep matmuls
# at full fp32 precision everywhere (only matters if a TPU backend sneaks in).
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng_seed():
    return 0
