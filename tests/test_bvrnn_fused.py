"""Fused scan cell (cfg.fused_cell) equivalence tests.

The fused cell recombines the per-step weights (models/bvrnn.py fused-cell
section) to cut the sequential op count — VERDICT r4 #2b.  Contract:

  * per step it computes the SAME function as the standard cell up to
    float reassociation (~1e-6 f32) — checked teacher-forced (same h, same
    codes), because closed-loop trajectories amplify reassociation noise
    and cannot be compared across cells;
  * all fused paths (encode_decode / decode / decode_plc) share one
    sub-step implementation, so the closed-loop state-sync invariant
    (reference bvrnn.py:204-206 == :226-227) holds BITWISE within fused
    mode — that is the property serving correctness rests on;
  * quantized dict weights are rejected.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bvsc_tpu.codec import BVRNNCodecModel
from bvsc_tpu.models import bvrnn
from test_codec import small_conf


@pytest.fixture(scope="module")
def setup():
    cfg = bvrnn.BVRNNConfig(x_dim=8, h_dim=32, z_dim=12,
                            precision=jax.lax.Precision.HIGHEST)
    fcfg = bvrnn.BVRNNConfig(x_dim=8, h_dim=32, z_dim=12,
                             precision=jax.lax.Precision.HIGHEST,
                             fused_cell=True)
    params = bvrnn.init_bvrnn_params(jax.random.key(7), cfg)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((3, 20, 8)).astype(np.float32))
    vb = jnp.full((3, 20), 9.0)
    return cfg, fcfg, params, y, vb


def test_fused_step_matches_standard_teacher_forced(setup):
    """One step from identical (h, z): fused == standard to reassociation."""
    cfg, fcfg, params, y, vb = setup
    prec = cfg.precision
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    z_t = jnp.asarray((rng.random((3, 12)) < 0.5).astype(np.float32))

    # standard decode-side step
    phi_z_t = bvrnn.phi_z_apply(params, z_t, prec)
    dec_t = bvrnn.dec_apply(
        params, jnp.concatenate([phi_z_t, h], -1), prec)
    phi_x_gen = bvrnn.phi_x_apply(
        params, bvrnn._normalize(params, dec_t), prec)
    h_next = bvrnn.gru_step(
        params["gru"], jnp.concatenate([phi_x_gen, phi_z_t], -1), h, prec)

    # fused decode-side step
    fp = bvrnn._fuse_inference_params(params, fcfg)
    _, d1h, gh = bvrnn._fused_h_combo(fp, h, prec)
    h_next_f, a3 = bvrnn._fused_tail(fp, h, z_t, d1h, gh, prec)
    dec_t_f = bvrnn._dense(fp["dec4"], a3, prec)

    np.testing.assert_allclose(np.asarray(dec_t_f), np.asarray(dec_t),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(h_next_f), np.asarray(h_next),
                               atol=2e-5, rtol=0)


def test_fused_enc_probabilities_match_standard(setup):
    """enc-side pre-round probabilities from identical (phi_x_t, h)."""
    cfg, fcfg, params, y, vb = setup
    prec = cfg.precision
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    ynorm = bvrnn._normalize(params, y[:, 0, :])
    phi_x_t = bvrnn.phi_x_apply(params, ynorm, prec)

    enc_std = bvrnn.enc_apply(
        params, jnp.concatenate([phi_x_t, h], -1), prec)

    fp = bvrnn._fuse_inference_params(params, fcfg)
    encx_t = jnp.matmul(phi_x_t, fp["w_enc1_x"], precision=prec)
    e1h, _, _ = bvrnn._fused_h_combo(fp, h, prec)
    a = jax.nn.elu(encx_t + e1h + fp["b_enc1"])
    a = jax.nn.elu(bvrnn._dense(fp["enc2"], a, prec))
    enc_f = jax.nn.sigmoid(bvrnn._dense(fp["enc3"], a, prec))
    np.testing.assert_allclose(np.asarray(enc_f), np.asarray(enc_std),
                               atol=2e-5, rtol=0)


def test_fused_state_sync_bitwise(setup):
    """encode_decode's decoded mel == decode() on its own codes, BITWISE,
    within fused mode — the closed-loop state-sync invariant."""
    _, fcfg, params, y, vb = setup
    h0 = jnp.zeros((3, 32))
    z, mel, h_fin = bvrnn.encode_decode(params, fcfg, y, vb, h0)
    mel2, h_fin2 = bvrnn.decode(params, fcfg, z, h0)
    assert np.array_equal(np.asarray(mel), np.asarray(mel2))
    assert np.array_equal(np.asarray(h_fin), np.asarray(h_fin2))


def test_fused_encode_variants_agree(setup):
    """fused encode / encode_with_state / encode_decode emit identical
    codes (they share the same step helpers)."""
    _, fcfg, params, y, vb = setup
    h0 = jnp.zeros((3, 32))
    z1, _ = bvrnn.encode(params, fcfg, y, vb, h0)
    z2, _ = bvrnn.encode_with_state(params, fcfg, y, vb, h0)
    z3, _, _ = bvrnn.encode_decode(params, fcfg, y, vb, h0)
    assert np.array_equal(np.asarray(z1), np.asarray(z2))
    assert np.array_equal(np.asarray(z1), np.asarray(z3))


def test_fused_plc_noloss_equals_decode_bitwise(setup):
    _, fcfg, params, y, vb = setup
    h0 = jnp.zeros((3, 32))
    z, _, _ = bvrnn.encode_decode(params, fcfg, y, vb, h0)
    mel, hf = bvrnn.decode(params, fcfg, z, h0)
    lost = jnp.zeros(z.shape[:2])
    mel_plc, hf_plc = bvrnn.decode_plc(params, fcfg, z, lost, h0)
    assert np.array_equal(np.asarray(mel), np.asarray(mel_plc))
    assert np.array_equal(np.asarray(hf), np.asarray(hf_plc))


def test_fused_plc_conceals(setup):
    """Lost frames produce finite output and re-converge (sanity)."""
    _, fcfg, params, y, vb = setup
    h0 = jnp.zeros((3, 32))
    z, _, _ = bvrnn.encode_decode(params, fcfg, y, vb, h0)
    lost = np.zeros(z.shape[:2], np.float32)
    lost[:, 5] = 1.0
    mel_plc, _ = bvrnn.decode_plc(params, fcfg, z, jnp.asarray(lost), h0)
    assert np.isfinite(np.asarray(mel_plc)).all()


def test_fused_unroll_is_pure_scheduling(setup):
    """unroll must not change fused numerics at all."""
    _, fcfg, params, y, vb = setup
    import dataclasses

    h0 = jnp.zeros((3, 32))
    z1, mel1, _ = bvrnn.encode_decode(params, fcfg, y, vb, h0)
    fcfg4 = dataclasses.replace(fcfg, unroll=4)
    z2, mel2, _ = bvrnn.encode_decode(params, fcfg4, y, vb, h0)
    assert np.array_equal(np.asarray(z1), np.asarray(z2))
    assert np.array_equal(np.asarray(mel1), np.asarray(mel2))


def test_fused_rejects_quantized_weights(setup):
    cfg, fcfg, params, y, vb = setup
    from bvsc_tpu.ops.quant import quantize_bvrnn_params

    qp = quantize_bvrnn_params(params)
    with pytest.raises(TypeError, match="quantized"):
        bvrnn._fuse_inference_params(qp, fcfg)


def test_codec_knob_defaults_and_guard():
    fast = BVRNNCodecModel(config=small_conf(), precision="default",
                           length_bucket=16)
    assert fast.fused_cell and fast.bvrnn_cfg.fused_cell
    parity = BVRNNCodecModel(config=small_conf(), precision="highest",
                             length_bucket=16)
    assert not parity.fused_cell
    q = BVRNNCodecModel(config=small_conf(), precision="default",
                        quantize="int8", length_bucket=16)
    assert not q.fused_cell  # int8 dict weights fall back to standard cell
    with pytest.raises(ValueError, match="fused_cell"):
        BVRNNCodecModel(config=small_conf(), precision="default",
                        quantize="int8", fused_cell=True, length_bucket=16)


def test_fused_codec_end_to_end(rng):
    """Full public-API chain with the fused fast codec: encode/decode/
    __call__ agree with the fused state-sync (codes equal, waveform equal
    to float precision between one-program and two-program paths)."""
    codec = BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16,
                            precision="default")
    L = 256 * 20
    x = (rng.standard_normal((2, L)) * 0.3).astype(np.float32)
    wav1 = np.asarray(codec(x, 3000))
    codes = np.asarray(codec.encode(x, 3000))
    wav2 = np.asarray(codec.decode(codes, L))
    assert wav1.shape == wav2.shape == (2, L)
    np.testing.assert_allclose(wav1, wav2, atol=5e-4)
