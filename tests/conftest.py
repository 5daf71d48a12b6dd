"""Test harness config: run all tests on CPU with 8 virtual devices.

Multi-chip sharding tests exercise a virtual 8-device mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``); the real-TPU path
is exercised by ``bench.py`` / ``__graft_entry__.py`` instead.
"""

import os

# Must be set before jax is imported anywhere, and must OVERRIDE (not
# setdefault) — the environment ships an ambient ``JAX_PLATFORMS=axon``
# that would otherwise silently put the whole suite on the tunneled TPU.
# Opt back into the real chip with ``BVSC_TEST_PLATFORM=axon``.
_plat = os.environ.get("BVSC_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat
os.environ["JAX_PLATFORM_NAME"] = _plat
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# Persistent compilation cache: scan compiles dominate test wall time (a
# tiny-shape decode-scan compile alone is minutes); repeated runs hit the
# cache and drop to seconds.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
