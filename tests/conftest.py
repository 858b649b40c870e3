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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
