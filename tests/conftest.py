"""Test configuration: run all tests on a virtual 8-device CPU mesh.

No TPU is needed in CI — sharding/pjit paths are validated against
``--xla_force_host_platform_device_count=8`` exactly as the driver's
multi-chip dry-run does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have pre-registered the axon TPU backend; force CPU here
# (tests must run hermetically on the virtual 8-device CPU mesh).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the suite is compile-dominated on the
# single-core CI host (measured: worst test 131 s cold → 28 s warm, full
# suite ~44 min → ~17 min). Safe here because tests are CPU-hermetic — the
# "never enable the cache" rule (CLAUDE.md) applies to the axon RELAY path
# only, where local executable serialization defeats remote compilation.
# Exported via os.environ so test-spawned subprocesses (graft dryruns, CLI
# smoke tests — all of which self-provision the CPU platform) share it.
# Opt out with JAX_TEST_CACHE_DIR=0; point elsewhere by setting it.
_cache_dir = os.environ.get(
    "JAX_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_test_cache"),
)
if _cache_dir != "0":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_between_modules():
    """Free jit caches after each test module.

    The CPU backend in long single-process sessions accumulates hundreds of
    compiled executables; jaxlib's compiler has intermittently segfaulted /
    aborted late in full-suite runs under that pressure (observed in
    backend_compile_and_load and in op dispatch). Dropping the caches at
    module boundaries keeps the live-executable count bounded; the
    framework's own lru-cached builders transparently recompile on next use.
    """
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
