"""Packet-loss concealment from the BVRNN prior (beyond-reference capability).

The reference trains a prior network P(z_t | h_t) for its Bernoulli KL
(reference ``bvrnn.py:148-156``) but never uses it at inference.  Here it
doubles as the PLC model: frames whose packets never arrived are decoded
from ``round(P(z_t | h_t))`` instead of dropping out (``models.bvrnn
.decode_plc``; surfaced as ``BVRNNCodecModel.decode(..., lost=...)`` and
``StreamingDecoder.feed(codes, lost=)`` / ``.conceal(n)``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bvsc_tpu.codec import BVRNNCodecModel
from bvsc_tpu.models import bvrnn as jbvrnn
from bvsc_tpu.streaming import StreamingDecoder
from test_codec import small_conf

X_DIM, H_DIM, Z_DIM = 16, 48, 12
T, B = 40, 2


@pytest.fixture(scope="module")
def small():
    cfg = jbvrnn.BVRNNConfig(x_dim=X_DIM, h_dim=H_DIM, z_dim=Z_DIM)
    params = jbvrnn.init_bvrnn_params(jax.random.key(5), cfg)
    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.standard_normal((B, T, X_DIM)), jnp.float32)
    bits = jnp.full((B, T), float(Z_DIM), jnp.float32)
    codes, _ = jbvrnn.encode(params, cfg, y, bits, jnp.zeros((B, H_DIM)))
    return cfg, params, np.asarray(codes)


def test_no_loss_equals_decode(small):
    """lost = all-zeros must be bitwise identical to the plain decode scan."""
    cfg, params, codes = small
    h0 = jnp.zeros((B, H_DIM))
    mel_ref, h_ref = jbvrnn.decode(params, cfg, jnp.asarray(codes), h0)
    mel, h = jbvrnn.decode_plc(
        params, cfg, jnp.asarray(codes), jnp.zeros((B, T)), h0
    )
    np.testing.assert_array_equal(np.asarray(mel), np.asarray(mel_ref))
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h_ref))


def test_concealed_frame_uses_prior(small):
    """A lost frame's effective codes come from the prior P(z | h_t) —
    the probabilities in 'expect' mode, round(P) in 'map' mode — masked to
    conceal_bits; checked against a manual substitution."""
    cfg, params, codes = small
    t_lost = 7
    prec = cfg.precision
    # run the plain decoder up to the lost frame to get h_{t_lost}
    h0 = jnp.zeros((B, H_DIM))
    _, h_t = jbvrnn.decode(params, cfg, jnp.asarray(codes[:, :t_lost]), h0)
    prior_p = jbvrnn.prior_apply(params, h_t, prec)

    for mode, prior_codes in (("expect", prior_p), ("map", jnp.round(prior_p))):
        for cbits, k in ((None, Z_DIM), (jnp.full((B, T), 5.0), 5)):
            z_exp = np.asarray(prior_codes).copy()
            z_exp[:, k:] = 0.5
            manual = np.array(codes)
            manual[:, t_lost] = z_exp
            mel_manual, _ = jbvrnn.decode(params, cfg, jnp.asarray(manual), h0)
            lost = np.zeros((B, T), np.float32)
            lost[:, t_lost] = 1.0
            mel_plc, _ = jbvrnn.decode_plc(
                params, cfg, jnp.asarray(codes), jnp.asarray(lost), h0, cbits,
                mode=mode,
            )
            # frames before the loss are bitwise identical (hoisted phi_z
            # path); from the lost frame on, the in-scan phi_z of the
            # concealed codes may differ from the hoisted matmul by float
            # reassociation only
            np.testing.assert_array_equal(
                np.asarray(mel_plc[:, :t_lost]),
                np.asarray(mel_manual[:, :t_lost]),
            )
            np.testing.assert_allclose(
                np.asarray(mel_plc), np.asarray(mel_manual), atol=1e-4
            )
    with pytest.raises(ValueError, match="concealment mode"):
        jbvrnn.decode_plc(
            params, cfg, jnp.asarray(codes), jnp.zeros((B, T)), h0, mode="x"
        )


def test_state_reconverges_after_loss(small):
    """After a short burst loss the decoder's trajectory re-converges to the
    clean one (GRU forgetting): the mel error well after the loss is a
    small fraction of the error at the loss."""
    cfg, params, codes = small
    h0 = jnp.zeros((B, H_DIM))
    mel_clean, _ = jbvrnn.decode(params, cfg, jnp.asarray(codes), h0)
    lost = np.zeros((B, T), np.float32)
    lost[:, 10:13] = 1.0  # 3-frame burst
    mel_plc, _ = jbvrnn.decode_plc(
        params, cfg, jnp.asarray(codes), jnp.asarray(lost), h0
    )
    err = np.abs(np.asarray(mel_plc) - np.asarray(mel_clean)).mean(axis=(0, 2))
    assert (err[:10] == 0).all()  # causal: nothing before the loss changes
    assert err[10:13].max() > 0
    tail = err[T - 8 :].mean()
    peak = err[10:16].max()
    assert tail < 0.3 * peak, f"no re-convergence: tail {tail:.4g} vs peak {peak:.4g}"


def test_codec_surface_plc(rng):
    """BVRNNCodecModel.decode(..., lost=...) — no-loss equality, concealment
    validity, mask shape validation, 1-D mask promotion."""
    codec = BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16)
    L = 12000
    x = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)
    codes = np.asarray(codec.encode(x, 3000))
    n = codes.shape[1]

    clean = np.asarray(codec.decode(codes, L))
    same = np.asarray(codec.decode(codes, L, lost=np.zeros((1, n))))
    np.testing.assert_array_equal(clean, same)

    lost = np.zeros(n, np.float32)
    lost[n // 2 : n // 2 + 2] = 1.0
    out = np.asarray(codec.decode(codes, L, lost=lost, conceal_bitrate=3000))
    assert out.shape == (1, L) and np.isfinite(out).all()
    assert not np.array_equal(out, clean)
    # causality: audio strictly before the lost frames is untouched
    hop = codec.conf.hopsize
    np.testing.assert_array_equal(out[:, : (n // 2) * hop],
                                  clean[:, : (n // 2) * hop])

    with pytest.raises(ValueError, match="lost mask shape"):
        codec.decode(codes, L, lost=np.zeros((1, n - 1)))


def test_streaming_plc_equals_offline(rng):
    """StreamingDecoder with per-chunk lost masks + conceal() equals the
    offline decode_plc trajectory exactly, and the vocoder keeps streaming
    through the loss (no output gap)."""
    codec = BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16)
    L = 12000
    x = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)
    codes = np.asarray(codec.encode(x, 3000))
    n = codes.shape[1]
    hop = codec.conf.hopsize

    lost = np.zeros((1, n), np.float32)
    lost[:, 5] = 1.0
    lost[:, 9:11] = 1.0

    # offline: full-sequence PLC decode through the codec surface
    offline = np.asarray(codec.decode(codes, n * hop, lost=lost))

    # streaming: feed received chunks, conceal() for the lost ones
    dec = StreamingDecoder(codec, batch=1)
    outs = []
    t = 0
    for seg, is_lost in (((0, 5), False), ((5, 6), True), ((6, 9), False),
                         ((9, 11), True), ((11, n), False)):
        a, b = seg
        if is_lost:
            outs.append(dec.conceal(b - a))
        else:
            outs.append(dec.feed(codes[:, a:b]))
        t = b
    stream = np.concatenate(outs, axis=1)
    assert stream.shape == (1, n * hop)
    np.testing.assert_allclose(stream, offline, atol=1e-5)


def test_streaming_conceal_bitrate_masks_prior(rng):
    """conceal_bitrate plumbs to the streaming decoder and DecodeEngine:
    concealment masked to the stream's real allocation equals the offline
    decode with the same conceal_bitrate, and differs from full-bits
    concealment."""
    from bvsc_tpu.serve.engine import DecodeEngine

    codec = BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16)
    L = 8192
    x = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)
    codes = np.asarray(codec.encode(x, 2000))
    n = codes.shape[1]
    hop = codec.conf.hopsize
    lost = np.zeros((1, n), np.float32)
    lost[:, 3:5] = 1.0

    off_masked = np.asarray(
        codec.decode(codes, n * hop, lost=lost, conceal_bitrate=500)
    )
    off_full = np.asarray(codec.decode(codes, n * hop, lost=lost))
    assert not np.array_equal(off_masked, off_full)

    dec = StreamingDecoder(codec, batch=1, conceal_bitrate=500)
    outs = [
        dec.feed(codes[:, t : t + 1], lost=lost[:, t : t + 1])
        for t in range(n)
    ]
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stream, off_masked[:, : n * hop], atol=1e-4)

    eng = DecodeEngine(codec, max_streams=2)
    sid = eng.open_stream(conceal_bitrate=500)
    eng.push(sid, codes[0], lost=lost[0])
    eng_out = np.concatenate([eng.tick()[sid] for _ in range(n)])
    np.testing.assert_allclose(eng_out, stream[0], atol=1e-5)


def test_fused_call_accepts_vbr_schedule(rng):
    """__call__ (fused path, the default) accepts per-frame schedules like
    encode(), including non-bucket-multiple lengths, and matches the
    two-program composition."""
    codec = BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16)
    L = 9000  # not a bucket multiple
    x = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)
    n = codec.frontend.num_frames(L)
    bps = np.where(np.arange(n) < n // 2, 1500.0, 5000.0).astype(np.float32)
    fused = np.asarray(codec(x, bps))
    two = np.asarray(codec.decode(codec.encode(x, bps), L))
    assert fused.shape == two.shape == (1, L)
    np.testing.assert_allclose(fused, two, atol=2e-6)
    with pytest.raises(ValueError, match="per-frame bitrate shape"):
        codec(x, bps[:-1])
