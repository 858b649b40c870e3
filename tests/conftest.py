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
