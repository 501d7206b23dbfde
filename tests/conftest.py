"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding is exercised
without TPU hardware (SURVEY.md §4: the distributed tier the reference never
had). The environment forces JAX_PLATFORMS=axon (TPU tunnel) globally, so we
must override — both the env var (before jax initializes) and the config
(the axon plugin registration wins over the env var otherwise).
"""
import os

# MSM_TEST_TPU=1 runs the suite on the real TPU backend instead (useful for
# the `-m slow` kernel tests, whose interpret-mode XLA:CPU compiles take
# minutes; on TPU the same tests run the real kernels).
_USE_TPU = os.environ.get("MSM_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # (XLA:CPU fast-compile flags were tried here and rejected: opt-level 0
    # halves compile time but doubles execution time of the montmul graphs,
    # a net loss — scripts/bench_cpu_compile.py, round 4.)
    os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the MSM pipeline graphs are expensive to
# compile on XLA:CPU (~minutes); cache them across test runs. Routed
# through enable_compilation_cache so MSM_CACHE_DIR redirects work (cold-
# suite measurement) and the committed aot/ seed applies.
from webgpu_msm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 1234
