"""Test configuration: force an 8-device virtual CPU mesh.

Must run before any jax import so the XLA platform flags take effect; pytest
imports conftest.py before collecting test modules, which guarantees that as
long as no test module imports jax at module scope before this file loads.
"""
import os

# The environment pins JAX_PLATFORMS to the TPU plugin; tests must run on a
# virtual 8-device CPU mesh. The env var alone is overridden by the plugin in
# this image, so force it through jax.config as well (that one sticks).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
