"""Test configuration: force an 8-virtual-device CPU JAX backend.

Multi-device sharding tests run without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md section 4's test
strategy).  Must run before jax initializes a backend, hence the env setup at
import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize registers the remote-TPU "axon" platform and
# forces jax_platforms to prefer it; tests must run on the 8-virtual-device
# CPU backend, so re-force it here before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
