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

# Fast/slow lanes: the full suite takes ~19 min on CPU (interpret-mode
# kernels, virtual-mesh parallelism, subprocess CLIs); the default dev lane
# is `pytest -m "not slow"` (<300 s), the full suite stays the merge gate.
# Modules listed here are wholly end-to-end/virtual-mesh; individually slow
# tests in mixed modules carry their own @pytest.mark.slow.
_SLOW_MODULES = frozenset({
    "test_cli",            # subprocess CLI end-to-end runs
    "test_scripts",        # shell-wrapper + repro-paper dry runs
    "test_parallel",       # 8-device virtual-mesh TP/SP/DP oracles
    "test_fsdp",           # ZeRO-3 virtual-mesh oracles
    "test_pipeline",       # GPipe staged-scan oracles
    "test_moe",            # expert-parallel virtual-mesh oracles
    "test_two_process",    # real 2-OS-process Gloo runs
    "test_graft_entry",    # driver-contract dryruns over 1/2/8-device meshes
    "test_integration",    # toy train-to-low-MMD
    "test_ema",            # includes a subprocess CLI run
    "test_inception",      # Flax Inception tower builds
    "test_inception_fidelity",  # torch-oracle golden comparisons
})


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
