"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding is exercised
without TPU hardware (SURVEY.md §4: the distributed tier the reference never
had). The env vars must be set before the first `import jax`.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 1234
