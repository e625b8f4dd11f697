"""Test harness: force an 8-device virtual CPU mesh before JAX import.

Per SURVEY §4: the JAX-native substitute for fake-backend distributed tests
is ``--xla_force_host_platform_device_count=8`` on the CPU platform, letting
the sharding/collective layer be validated without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = os.environ.get("DDM_TPU_TEST_PLATFORM", "cpu")

import jax  # noqa: E402

# Force CPU regardless of inherited platform (the live env pins the "axon"
# TPU tunnel via sitecustomize, which registers its backend before conftest
# runs — the env var alone is too late; the config update is not). Tests
# must not burn real-chip compile time. Run on hardware with
# DDM_TPU_TEST_PLATFORM=tpu.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
