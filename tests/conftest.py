"""Test harness config: force CPU with 8 virtual devices so mesh/sharding
logic is testable without TPUs (SURVEY.md §4 implication (d))."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's axon site package re-selects the TPU even when JAX_PLATFORMS
# is set; the config update below is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy integration tests (CLI subprocess smokes, full-scale "
        "rig/parity runs); deselect with -m 'not slow' for quick iteration",
    )
    config.addinivalue_line(
        "markers",
        "medium: multi-step numerical-equivalence tests (sharded-vs-single "
        "train steps, mixed-precision curves, chunked/remat equivalence) — "
        "30s-2min each on this host; the quick dev loop is "
        "-m 'not slow and not medium' (<5 min), CI runs everything",
    )
