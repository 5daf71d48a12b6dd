"""Parity + property tests for the scan-based BVRNN vs the reference torch
implementation (reference ``bvrnn.py``), using random weights moved across
frameworks through ``bvsc_tpu.convert``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from bvsc_tpu.convert import bvrnn_params_from_torch, bvrnn_params_to_torch_sd
from bvsc_tpu.models import bvrnn as jbvrnn
from torch_ref import import_reference_bvrnn

X_DIM, H_DIM, Z_DIM = 16, 48, 12
T, B = 25, 3


@pytest.fixture(scope="module")
def ref_model():
    ref = import_reference_bvrnn()
    torch.manual_seed(0)
    mean_std = [
        np.random.default_rng(1).standard_normal(X_DIM).astype("float64") * 0.1,
        np.abs(np.random.default_rng(2).standard_normal(X_DIM)).astype("float64") + 0.5,
    ]
    m = ref.BVRNN(X_DIM, H_DIM, Z_DIM, mean_std, -1.0, True)
    m.eval()
    return m


@pytest.fixture(scope="module")
def jcfg():
    return jbvrnn.BVRNNConfig(x_dim=X_DIM, h_dim=H_DIM, z_dim=Z_DIM, var_bit=True)


@pytest.fixture(scope="module")
def jparams(ref_model):
    return bvrnn_params_from_torch(ref_model.state_dict())


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    y = rng.standard_normal((B, T, X_DIM)).astype(np.float32)
    bits = rng.integers(1, Z_DIM + 1, size=(B, T)).astype(np.float32)
    return y, bits


@pytest.mark.slow
def test_encode_codes_bitexact(ref_model, jcfg, jparams, data):
    y, bits = data
    with torch.no_grad():
        z_ref, h_ref = ref_model.encode(
            torch.from_numpy(y), torch.from_numpy(bits),
            torch.zeros(1, B, H_DIM),
        )
    z, h_seq = jbvrnn.encode(
        jparams, jcfg, jnp.asarray(y), jnp.asarray(bits), jnp.zeros((B, H_DIM))
    )
    # binary codes must agree exactly; masked bits are 0.5 on both sides
    np.testing.assert_array_equal(np.asarray(z), z_ref.numpy())
    np.testing.assert_allclose(np.asarray(h_seq), h_ref.numpy(), atol=2e-5)


@pytest.mark.slow
def test_decode_matches(ref_model, jcfg, jparams, data):
    y, bits = data
    rng = np.random.default_rng(3)
    z = rng.integers(0, 2, size=(B, T, Z_DIM)).astype(np.float32)
    with torch.no_grad():
        mel_ref, h_ref = ref_model.decode(torch.from_numpy(z), torch.zeros(1, B, H_DIM))
    mel, h = jbvrnn.decode(jparams, jcfg, jnp.asarray(z), jnp.zeros((B, H_DIM)))
    np.testing.assert_allclose(np.asarray(mel), mel_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy()[0], atol=2e-5)


@pytest.mark.parametrize("p_use_gen", [0.0, 1.0])
@pytest.mark.slow
def test_forward_train_matches_at_deterministic_p(ref_model, jcfg, jparams, data, p_use_gen):
    # at p_use_gen 0 or 1 the scheduled-sampling branch is deterministic,
    # so greedy forward is comparable across frameworks
    y, bits = data
    with torch.no_grad():
        mel_ref, kld_ref = ref_model.forward(
            torch.from_numpy(y), p_use_gen, True, torch.from_numpy(bits)
        )
    mel, kld = jbvrnn.forward_train(
        jparams, jcfg, jnp.asarray(y), p_use_gen, True, jnp.asarray(bits),
        jax.random.key(0),
    )
    np.testing.assert_allclose(np.asarray(mel), mel_ref.numpy(), atol=3e-5)
    np.testing.assert_allclose(float(kld), float(kld_ref), atol=1e-4, rtol=1e-4)


def test_encode_decode_state_sync(jcfg, jparams, data):
    """The streaming invariant: decode(h0=0) over encode's codes sees the
    same hidden trajectory, so decode's output equals the decoder outputs the
    encoder computed internally (reference bvrnn.py:204-206 / :226-227).

    Asserted directly: recompute the encoder-internal ``dec_t`` from the
    codes and the pre-frame hidden states ``h_seq`` that encode returns
    (the exact inputs encode fed its dec MLP) and require equality with
    ``decode()``'s trajectory."""
    y, bits = data
    h0 = jnp.zeros((B, H_DIM))
    z, h_seq = jbvrnn.encode(jparams, jcfg, jnp.asarray(y), jnp.asarray(bits), h0)
    phi_z = jbvrnn.phi_z_apply(jparams, z.astype(jcfg.dtype), jcfg.precision)
    dec_enc = jbvrnn.dec_apply(
        jparams,
        jnp.concatenate([phi_z, h_seq.astype(jcfg.dtype)], -1),
        jcfg.precision,
    )
    mel_dec, _ = jbvrnn.decode(jparams, jcfg, z, h0)
    np.testing.assert_allclose(
        np.asarray(mel_dec), np.asarray(dec_enc), atol=1e-6, rtol=0
    )
    # and decode itself is deterministic
    mel2, _ = jbvrnn.decode(jparams, jcfg, z, h0)
    np.testing.assert_array_equal(np.asarray(mel_dec), np.asarray(mel2))


def test_encode_decode_fused_matches_composed(jcfg, jparams, data):
    """The fused one-scan encode_decode must reproduce encode_with_state's
    codes and final state bit-for-bit (the scan bodies are op-identical),
    and decode's mel trajectory to float precision — decode() hoists its
    phi_z matmul over the whole sequence while the fused scan computes it
    per step, and batched-vs-per-step matmul tiling differs by ~1 ULP.
    Also covered: trailing frames marked invalid (the codec's
    bucket-padding convention: those frames' codes are 0.5-forced in-scan,
    matching decode() on codes that were trimmed and 0.5-re-padded)."""
    y, bits = data
    h0 = jnp.zeros((B, H_DIM))
    yj, bj = jnp.asarray(y), jnp.asarray(bits)

    z_ref, h_ref = jbvrnn.encode_with_state(jparams, jcfg, yj, bj, h0)
    mel_ref, _ = jbvrnn.decode(jparams, jcfg, z_ref, h0)
    z, mel, h_fin = jbvrnn.encode_decode(jparams, jcfg, yj, bj, h0)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z_ref))
    np.testing.assert_allclose(
        np.asarray(mel), np.asarray(mel_ref), atol=1e-6, rtol=0
    )
    np.testing.assert_array_equal(np.asarray(h_fin), np.asarray(h_ref))

    # invalid tail frames == decode over trimmed + 0.5-padded codes
    T = y.shape[1]
    n_valid = T - 3
    valid = (jnp.arange(T)[None, :] < n_valid).astype(jnp.float32)
    valid = jnp.broadcast_to(valid, (B, T))
    z_v, mel_v, _ = jbvrnn.encode_decode(
        jparams, jcfg, yj, bj, h0, frame_valid=valid
    )
    z_pad = jnp.concatenate(
        [z_ref[:, :n_valid], jnp.full((B, 3, z_ref.shape[-1]), 0.5)], axis=1
    )
    mel_pad, _ = jbvrnn.decode(jparams, jcfg, z_pad, h0)
    np.testing.assert_array_equal(
        np.asarray(z_v[:, :n_valid]), np.asarray(z_ref[:, :n_valid])
    )
    np.testing.assert_array_equal(np.asarray(z_v), np.asarray(z_pad))
    np.testing.assert_allclose(
        np.asarray(mel_v), np.asarray(mel_pad), atol=1e-6, rtol=0
    )


@pytest.mark.slow
def test_chunked_encode_equals_oneshot(jcfg, jparams, data):
    y, bits = data
    ya, yb = jnp.asarray(y[:, :10]), jnp.asarray(y[:, 10:])
    ba, bb = jnp.asarray(bits[:, :10]), jnp.asarray(bits[:, 10:])
    z_full, _ = jbvrnn.encode(jparams, jcfg, jnp.asarray(y), jnp.asarray(bits),
                              jnp.zeros((B, H_DIM)))
    za, h_mid = jbvrnn.encode_with_state(jparams, jcfg, ya, ba, jnp.zeros((B, H_DIM)))
    zb, _ = jbvrnn.encode_with_state(jparams, jcfg, yb, bb, h_mid)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([za, zb], axis=1)), np.asarray(z_full)
    )


def test_bit_mask_properties(jcfg, jparams, data):
    y, _ = data
    # k bits => first k entries binary, rest exactly 0.5
    k = 5
    bits = jnp.full((B, T), float(k))
    z, _ = jbvrnn.encode(jparams, jcfg, jnp.asarray(y), bits, jnp.zeros((B, H_DIM)))
    z = np.asarray(z)
    assert set(np.unique(z[:, :, :k])) <= {0.0, 1.0}
    assert (z[:, :, k:] == 0.5).all()


def test_causality_of_codes(jcfg, jparams, data):
    """Changing future frames must not change past codes."""
    y, bits = data
    z1, _ = jbvrnn.encode(jparams, jcfg, jnp.asarray(y), jnp.asarray(bits),
                          jnp.zeros((B, H_DIM)))
    y2 = y.copy()
    y2[:, 15:] += 10.0
    z2, _ = jbvrnn.encode(jparams, jcfg, jnp.asarray(y2), jnp.asarray(bits),
                          jnp.zeros((B, H_DIM)))
    np.testing.assert_array_equal(np.asarray(z1)[:, :15], np.asarray(z2)[:, :15])


@pytest.mark.slow
def test_fixed_bitrate_parity(ref_model, jparams, data):
    """var_bit=False (the fixed64 config family, reference
    ``bvrnn.py:104-108,180-184`` else-branches): no bit mask — all z_dim
    bits are transmitted.  Codes must be bit-exact vs the reference torch
    model built with variableBit=False, and every bit binary (no 0.5
    fill).  Reuses ref_model's weights: variableBit changes control flow
    only, not parameters."""
    ref = import_reference_bvrnn()
    y, bits = data
    mean_std = [
        ref_model.mean_mel.detach().numpy().astype("float64"),
        ref_model.std_mel.detach().numpy().astype("float64"),
    ]
    m_fixed = ref.BVRNN(X_DIM, H_DIM, Z_DIM, mean_std, -1.0, False)
    m_fixed.load_state_dict(ref_model.state_dict())
    m_fixed.eval()
    with torch.no_grad():
        z_ref, _ = m_fixed.encode(
            torch.from_numpy(y), torch.from_numpy(bits), torch.zeros(1, B, H_DIM)
        )
        mel_ref, kld_ref = m_fixed.forward(
            torch.from_numpy(y), 0.0, True, torch.from_numpy(bits)
        )

    jcfg_fixed = jbvrnn.BVRNNConfig(
        x_dim=X_DIM, h_dim=H_DIM, z_dim=Z_DIM, var_bit=False
    )
    z, _ = jbvrnn.encode(
        jparams, jcfg_fixed, jnp.asarray(y), None, jnp.zeros((B, H_DIM))
    )
    np.testing.assert_array_equal(np.asarray(z), z_ref.numpy())
    assert set(np.unique(np.asarray(z))) <= {0.0, 1.0}

    mel, kld = jbvrnn.forward_train(
        jparams, jcfg_fixed, jnp.asarray(y), 0.0, True, None, jax.random.key(0)
    )
    np.testing.assert_allclose(np.asarray(mel), mel_ref.numpy(), atol=3e-5)
    np.testing.assert_allclose(float(kld), float(kld_ref), atol=1e-4, rtol=1e-4)


def test_converter_roundtrip(ref_model, jparams):
    sd = bvrnn_params_to_torch_sd(jparams)
    for k, v in ref_model.state_dict().items():
        np.testing.assert_allclose(sd[k], v.numpy(), atol=1e-6, err_msg=k)


def test_param_count_matches_reference_scale():
    """Full-size model must land on the documented 23.45 M params
    (SURVEY §6 / reference checkpoint size)."""
    cfg = jbvrnn.BVRNNConfig()
    params = jbvrnn.init_bvrnn_params(jax.random.key(0), cfg)
    n = jbvrnn.param_count(params)
    assert 23.3e6 < n < 23.6e6, n


@pytest.mark.slow
def test_grads_flow_through_straight_through(jcfg, jparams, data):
    y, bits = data

    def loss_fn(params):
        mel, kld = jbvrnn.forward_train(
            params, jcfg, jnp.asarray(y), 0.5, False, jnp.asarray(bits),
            jax.random.key(1),
        )
        return jnp.mean((mel - jnp.asarray(y)) ** 2) + 0.01 * kld

    grads = jax.grad(loss_fn)(jparams)
    # encoder MLP receives gradient through the straight-through estimator
    g_enc = np.asarray(grads["enc"][0]["w"])
    assert np.isfinite(g_enc).all() and np.abs(g_enc).max() > 0
    g_prior = np.asarray(grads["prior"][0]["w"])
    assert np.isfinite(g_prior).all() and np.abs(g_prior).max() > 0
