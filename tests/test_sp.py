"""Sequence-parallel vocoder == one-shot generator on the virtual mesh.

The SP scheme (parallel/sp.py) is the streaming state-carry design mapped
onto space: every conv's left context / transposed-conv overlap-add carry is
a ppermute halo from the left neighbor, with shard 0 receiving zeros (== the
one-shot causal zero padding).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bvsc_tpu.models import vocoder as jvoc
from bvsc_tpu.parallel.sp import generator_apply_sp, make_sp_mesh
from test_codec import small_conf


@pytest.fixture(scope="module")
def cfg():
    return small_conf().vocoder_config


@pytest.fixture(scope="module")
def params(cfg):
    return jvoc.init_generator_params(jax.random.key(0), cfg, weight_norm=False)


@pytest.mark.parametrize("n_dev,T", [(2, 16), (4, 32), (8, 48)])
def test_sp_generator_matches_oneshot(cfg, params, rng, n_dev, T):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual multi-device harness")
    up = cfg.total_upsample
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mels, T)), jnp.float32)
    ref = np.asarray(
        jvoc.generator_apply(
            params, cfg, mel, T * up, precision=jax.lax.Precision.HIGHEST
        )
    )
    mesh = make_sp_mesh(n_dev)
    got = np.asarray(
        generator_apply_sp(
            params, cfg, mel, mesh, precision=jax.lax.Precision.HIGHEST
        )
    )
    assert got.shape == ref.shape == (2, 1, T * up)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_sp_generator_jits(cfg, params, rng):
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device harness")
    mesh = make_sp_mesh(2)
    T = 16
    mel = jnp.asarray(rng.standard_normal((1, cfg.num_mels, T)), jnp.float32)

    @jax.jit
    def fn(p, m):
        return generator_apply_sp(p, cfg, m, mesh)

    y = fn(params, mel)
    assert y.shape == (1, 1, T * cfg.total_upsample)
    assert np.isfinite(np.asarray(y)).all()


def test_sp_generator_input_validation(cfg, params, rng):
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device harness")
    mesh = make_sp_mesh(2)
    # frames not divisible by shards
    mel = jnp.zeros((1, cfg.num_mels, 15), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        generator_apply_sp(params, cfg, mel, mesh)
    # shards too short for conv_pre's 6-frame left context
    mel = jnp.zeros((1, cfg.num_mels, 8), jnp.float32)
    with pytest.raises(ValueError, match="halo"):
        generator_apply_sp(params, cfg, mel, mesh)


def test_sp_rejects_noncausal(cfg, params):
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual multi-device harness")
    import dataclasses

    mesh = make_sp_mesh(2)
    sym = dataclasses.replace(cfg, layers_sym=(True,) * len(cfg.layers_sym))
    mel = jnp.zeros((1, cfg.num_mels, 16), jnp.float32)
    with pytest.raises(ValueError, match="causal"):
        generator_apply_sp(params, sym, mel, mesh)


def test_sp_composes_with_data_parallel(cfg, params, rng):
    """2-D (data x seq) mesh: streams sharded over data, frames over seq —
    must equal the one-shot generator exactly like the 1-D case."""
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual multi-device harness")
    from bvsc_tpu.parallel.sp import make_dp_sp_mesh

    mesh = make_dp_sp_mesh(2, 4)
    T = 32
    up = cfg.total_upsample
    mel = jnp.asarray(rng.standard_normal((4, cfg.num_mels, T)), jnp.float32)
    ref = np.asarray(
        jvoc.generator_apply(
            params, cfg, mel, T * up, precision=jax.lax.Precision.HIGHEST
        )
    )
    got = np.asarray(
        generator_apply_sp(
            params, cfg, mel, mesh, precision=jax.lax.Precision.HIGHEST
        )
    )
    assert got.shape == ref.shape == (4, 1, T * up)
    np.testing.assert_allclose(got, ref, atol=1e-5)
