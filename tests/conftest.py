"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use XLA's
host-platform device-count override instead (the TPU-native analogue of the
reference's untested NCCL/DDP path — see SURVEY.md §4).
"""

import os

# The environment pins JAX_PLATFORMS=axon (the tunnelled TPU) and a
# sitecustomize module imports jax at interpreter start, freezing that
# choice before this file runs — so the env var alone is not enough; we
# must also update the live jax config. Unit tests must be deterministic
# f32 CPU runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Dedicated persistent XLA:CPU compile cache for the test tier (same
# pattern as tools/dryrun_worker.py's dedicated cache — never the
# session-wide TPU cache, which round 1 showed can go stale). The suite's
# wall time on this 1-core host is dominated by XLA:CPU compiles of the
# reduced 5-net graphs; a warm cache cuts `pytest -q` by tens of minutes.
# Set MARCONET_TEST_CACHE=off to disable.
_cache = os.environ.get(
    "MARCONET_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".test_xla_cache"))
if _cache and _cache != "off":
    # key on the host CPU's feature set: XLA:CPU AOT entries embed the
    # compile machine's features, and loading one on a different host
    # generation risks SIGILL (marconet_tpu.utils.jaxcache docstring)
    from marconet_tpu.utils.jaxcache import host_cpu_fingerprint

    _cache = os.path.join(_cache, host_cpu_fingerprint())
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    # 8 virtual devices unless the environment presets another count
    assert jax.device_count() >= 1


@pytest.fixture
def rng():
    return np.random.default_rng(0)
