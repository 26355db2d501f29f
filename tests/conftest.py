"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, hence the
environment mutation at import time (this file is imported by pytest before
any test module).
"""

import os

# Force-set (the machine profile exports JAX_PLATFORMS=axon for the TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize's register() overrides jax_platforms via
# jax.config at interpreter start, so the env var alone is not enough.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly marked ``slow`` is the ``fast`` tier
    (`pytest -m fast` runs in <2 min on this 1-vCPU host; the heavy
    torch-parity and protocol-e2e tests are `-m slow`)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(27)
