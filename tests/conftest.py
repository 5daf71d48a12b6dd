"""Test harness config: run all tests on CPU with 8 virtual devices.

Multi-chip sharding tests exercise a virtual 8-device mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``); the real-TPU path
is exercised by ``bench.py`` / ``__graft_entry__.py`` instead.
"""

import os

# Must be set before jax is imported anywhere.  NOTE: with the axon TPU
# plugin JAX_PLATFORMS alone is not honored; JAX_PLATFORM_NAME is.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
