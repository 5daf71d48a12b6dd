"""Test harness config: run all tests on CPU with 8 virtual devices.

Multi-chip sharding tests exercise a virtual 8-device mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``); the real-TPU path
is exercised by ``bench.py`` / ``__graft_entry__.py`` instead.

HOW the platform is forced: this environment ships an axon TPU plugin whose
sitecustomize imports jax at interpreter start, so by the time conftest
runs, ``os.environ['JAX_PLATFORMS']`` is too late — jax read its env at
import.  Backends, however, initialize lazily: overriding via
``jax.config.update`` before the first ``jax.devices()`` call still works
(and XLA_FLAGS is read at backend init, so the env write below is in time).
Opt into the real chip with ``BVSC_TEST_PLATFORM=axon``.
"""

import os

import jax

_plat = os.environ.get("BVSC_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _plat)
jax.config.update("jax_platform_name", _plat)
_flags = os.environ.get("XLA_FLAGS", "")
if _plat == "cpu" and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
_backends = getattr(getattr(jax._src, "xla_bridge", None), "_backends", None)
if _backends:  # None (attr moved in a jax upgrade) is fine; non-empty is not
    raise RuntimeError(
        "a plugin initialized jax backends before conftest; platform forcing "
        "came too late"
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: scan compiles dominate test wall time (a
# tiny-shape decode-scan compile alone is minutes); repeated runs hit the
# cache and drop to seconds.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
