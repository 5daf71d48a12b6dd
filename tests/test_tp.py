"""Tensor-parallel BVRNN decode == single-device decode on the virtual mesh.

The TP scheme (parallel/tp.py) is mathematically identical to
``bvrnn.decode`` up to f32 summation order: row-parallel layers split the
contraction across devices and psum the partials.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bvsc_tpu.models import bvrnn as jbvrnn
from bvsc_tpu.parallel.tp import (
    decode_tp,
    make_tp_mesh,
    prepare_tp_params,
    shard_tp_params,
)

H_DIM, Z_DIM, X_DIM, B, T = 64, 16, 8, 2, 12


@pytest.fixture(scope="module")
def cfg():
    return jbvrnn.BVRNNConfig(
        x_dim=X_DIM, h_dim=H_DIM, z_dim=Z_DIM,
        precision=jax.lax.Precision.HIGHEST,
    )


@pytest.fixture(scope="module")
def params(cfg):
    p = jbvrnn.init_bvrnn_params(jax.random.key(0), cfg)
    # non-trivial mel stats so the re-normalization path is exercised
    p["mean_mel"] = jnp.linspace(-6.0, -4.0, X_DIM)
    p["std_mel"] = jnp.linspace(1.0, 3.0, X_DIM)
    return p


@pytest.mark.parametrize("n_dev", [2, 8])
def test_decode_tp_matches_single_device(cfg, params, rng, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual multi-device harness")
    z = jnp.asarray(rng.integers(0, 2, (B, T, Z_DIM)).astype(np.float32))
    h0 = jnp.zeros((B, H_DIM), jnp.float32)

    ref_mel, ref_h = jbvrnn.decode(params, cfg, z, h0)

    mesh = make_tp_mesh(n_dev)
    tpp = shard_tp_params(mesh, prepare_tp_params(params))
    mel, h = decode_tp(tpp, cfg, z, h0, mesh)

    np.testing.assert_allclose(np.asarray(mel), np.asarray(ref_mel),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               atol=2e-5, rtol=0)


def test_decode_tp_jits(cfg, params, rng):
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device harness")
    import functools

    z = jnp.asarray(rng.integers(0, 2, (B, T, Z_DIM)).astype(np.float32))
    h0 = jnp.zeros((B, H_DIM), jnp.float32)
    mesh = make_tp_mesh(4)
    tpp = shard_tp_params(mesh, prepare_tp_params(params))
    f = jax.jit(functools.partial(decode_tp, cfg=cfg, mesh=mesh))
    out1, _ = f(tpp, z=z, h0=h0)
    out2, _ = f(tpp, z=z, h0=h0)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_encode_tp_matches_single_device(cfg, params, rng):
    """TP encode produces bit-identical codes (rounding thresholds are
    ~1e-7 away from any prob under f32 summation-order differences)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual multi-device harness")
    y = jnp.asarray(rng.standard_normal((B, T, X_DIM)).astype(np.float32) - 5.0)
    bits = jnp.full((B, T), float(Z_DIM), jnp.float32)
    h0 = jnp.zeros((B, H_DIM), jnp.float32)

    ref_z, ref_h = jbvrnn.encode_with_state(params, cfg, y, bits, h0)

    from bvsc_tpu.parallel.tp import encode_tp

    mesh = make_tp_mesh(8)
    tpp = shard_tp_params(mesh, prepare_tp_params(params))
    z, h = encode_tp(tpp, cfg, y, bits, h0, mesh)

    np.testing.assert_array_equal(np.asarray(z), np.asarray(ref_z))
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               atol=2e-5, rtol=0)


def test_dp_tp_2d_mesh(cfg, params, rng):
    """Composed DP x TP on a (data=2, model=4) mesh: streams sharded over
    data, weights over model — codes and mel match single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual multi-device harness")
    from bvsc_tpu.parallel.tp import encode_tp, make_dp_tp_mesh

    y = jnp.asarray(rng.standard_normal((B, T, X_DIM)).astype(np.float32) - 5.0)
    bits = jnp.full((B, T), float(Z_DIM), jnp.float32)
    h0 = jnp.zeros((B, H_DIM), jnp.float32)

    ref_z, _ = jbvrnn.encode_with_state(params, cfg, y, bits, h0)
    ref_mel, _ = jbvrnn.decode(params, cfg, ref_z, h0)

    mesh = make_dp_tp_mesh(2, 4)
    tpp = shard_tp_params(mesh, prepare_tp_params(params))
    z, _ = encode_tp(tpp, cfg, y, bits, h0, mesh)
    mel, _ = decode_tp(tpp, cfg, z, h0, mesh)

    np.testing.assert_array_equal(np.asarray(z), np.asarray(ref_z))
    np.testing.assert_allclose(np.asarray(mel), np.asarray(ref_mel),
                               atol=2e-5, rtol=0)
