"""Serving engine + bitpack tests."""

import numpy as np
import pytest

from bvsc_tpu.codec import BVRNNCodecModel
from bvsc_tpu.ops.bitpack import pack_codes, unpack_codes, _load_native
from bvsc_tpu.serve.engine import ServingEngine
from bvsc_tpu.streaming import StreamingCodec
from test_codec import small_conf


@pytest.fixture(scope="module")
def codec():
    return BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16)


@pytest.mark.slow
def test_engine_matches_streaming_codec(codec, rng):
    """One engine slot must behave exactly like a dedicated StreamingCodec."""
    L = 256 * 12 + 768
    x = (rng.standard_normal(L) * 0.3).astype(np.float32)

    eng = ServingEngine(codec, max_streams=4)
    sid = eng.open_stream(3000)
    eng.push(sid, x)
    codes_eng, wav_eng = [], []
    while True:
        out = eng.tick()
        if sid not in out:
            break
        c, w = out[sid]
        codes_eng.append(c)
        wav_eng.append(w)

    sc = StreamingCodec(codec, batch=1, bitrate=3000)
    wav_ref = sc.process(x[None, :])
    codes_ref = sc.encoder  # codes came through decoder; recompute via encoder
    from bvsc_tpu.streaming import StreamingEncoder

    enc = StreamingEncoder(codec, batch=1, bitrate=3000)
    codes_ref = enc.feed(x[None, :])

    codes_eng = np.stack(codes_eng)
    np.testing.assert_array_equal(codes_eng, codes_ref[0])
    np.testing.assert_allclose(
        np.concatenate(wav_eng), wav_ref[0], atol=1e-5
    )


@pytest.mark.slow
def test_engine_concurrent_streams_independent(codec, rng):
    """Two concurrent streams give the same results as two solo runs."""
    L = 768 + 256 * 6
    x1 = (rng.standard_normal(L) * 0.3).astype(np.float32)
    x2 = (rng.standard_normal(L) * 0.2).astype(np.float32)

    def solo(x, bitrate):
        eng = ServingEngine(codec, max_streams=4)
        sid = eng.open_stream(bitrate)
        eng.push(sid, x)
        cs = []
        while True:
            out = eng.tick()
            if sid not in out:
                break
            cs.append(out[sid][0])
        return np.stack(cs)

    c1_solo = solo(x1, 3000)
    c2_solo = solo(x2, 1500)

    eng = ServingEngine(codec, max_streams=4)
    s1 = eng.open_stream(3000)
    s2 = eng.open_stream(1500)  # different per-stream bitrate
    eng.push(s1, x1)
    eng.push(s2, x2)
    c1, c2 = [], []
    while True:
        out = eng.tick()
        if not out:
            break
        if s1 in out:
            c1.append(out[s1][0])
        if s2 in out:
            c2.append(out[s2][0])
    np.testing.assert_array_equal(np.stack(c1), c1_solo)
    np.testing.assert_array_equal(np.stack(c2), c2_solo)


@pytest.mark.slow
def test_engine_slot_reuse_resets_state(codec, rng):
    L = 768 + 256 * 3
    x = (rng.standard_normal(L) * 0.3).astype(np.float32)

    eng = ServingEngine(codec, max_streams=4)  # B=4: reuse jit cache
    sid = eng.open_stream(3000)
    others = [eng.open_stream(3000) for _ in range(3)]  # exhaust the free list
    eng.push(sid, x)
    first = []
    while True:
        out = eng.tick()
        if sid not in out:
            break
        first.append(out[sid][0])
    eng.close_stream(sid)

    sid2 = eng.open_stream(3000)  # FIFO free list -> same slot back
    assert sid2 == sid
    eng.push(sid2, x)
    second = []
    while True:
        out = eng.tick()
        if sid2 not in out:
            break
        second.append(out[sid2][0])
    np.testing.assert_array_equal(np.stack(first), np.stack(second))


def test_engine_overflow(codec):
    eng = ServingEngine(codec, max_streams=2)
    eng.open_stream(3000)
    eng.open_stream(3000)
    with pytest.raises(RuntimeError):
        eng.open_stream(3000)


def test_sample_queue_chunked_fifo(rng):
    """_SampleQueue is an exact FIFO across arbitrary push/pop splits."""
    from bvsc_tpu.serve.engine import _SampleQueue

    data = rng.standard_normal(10_000).astype(np.float32)
    q = _SampleQueue()
    i = 0
    while i < data.size:
        n = int(rng.integers(1, 700))
        q.push(data[i : i + n])
        i += n
    q.push(np.zeros(0, np.float32))  # empty push is a no-op
    out, j = [], 0
    while len(q):
        n = min(int(rng.integers(1, 900)), len(q))
        out.append(q.pop(n))
        j += n
    np.testing.assert_array_equal(np.concatenate(out), data)
    with pytest.raises(ValueError):
        q.pop(1)


def test_engine_flush_matches_fused_packet_codec(codec, rng):
    """begin_flush drains the queue through the one-shot right reflect
    padding: engine output == FusedPacketCodec process()+flush(), for both
    a hop-multiple input and one with a sub-hop remainder."""
    from bvsc_tpu.streaming import FusedPacketCodec

    for L in (768 + 256 * 4, 768 + 256 * 3 + 100):
        x = (rng.standard_normal(L) * 0.3).astype(np.float32)

        fpc = FusedPacketCodec(codec, batch=1, bitrate=3000)
        wav_ref = np.concatenate(
            [fpc.process(x[None, :]), fpc.flush()], axis=1
        )[0]

        eng = ServingEngine(codec, max_streams=4)
        sid = eng.open_stream(3000)
        eng.push(sid, x)
        assert eng.begin_flush(sid)
        assert eng.begin_flush(sid)  # idempotent
        with pytest.raises(ValueError, match="flushing"):
            eng.push(sid, x[:10])
        ws = []
        while True:
            out = eng.tick()
            if sid not in out:
                break
            ws.append(out[sid][1])
        np.testing.assert_allclose(np.concatenate(ws), wav_ref, atol=1e-5)


def test_engine_flush_too_short_stream_is_noop(codec):
    """A stream whose total input can never fill the first frame drains to
    nothing (like a one-shot call on an unframeable input)."""
    eng = ServingEngine(codec, max_streams=2)
    sid = eng.open_stream(3000)
    eng.push(sid, np.zeros(100, np.float32))
    assert not eng.begin_flush(sid)
    assert eng.tick() == {}


def test_engine_state_lost_recovery(codec, rng):
    """A tick that fails after donating the device state must not brick
    the engine: it raises EngineStateLost, rebuilds zeroed state, and a
    fresh stream then produces exactly a fresh engine's output."""
    from bvsc_tpu.serve.engine import EngineStateLost

    L = 768 + 256 * 2
    x = (rng.standard_normal(L) * 0.3).astype(np.float32)
    codes_ref, _ = None, None

    ref = ServingEngine(codec, max_streams=4)
    sid = ref.open_stream(3000)
    ref.push(sid, x)
    codes_ref = []
    while True:
        out = ref.tick()
        if sid not in out:
            break
        codes_ref.append(out[sid][0])

    eng = ServingEngine(codec, max_streams=4)
    sid = eng.open_stream(3000)
    eng.push(sid, x)
    orig = eng._tick_call
    calls = {"n": 0}

    def failing(*a, **k):
        calls["n"] += 1
        raise RuntimeError("simulated device failure mid-dispatch")

    eng._tick_call = failing
    with pytest.raises(EngineStateLost):
        eng.tick()
    assert calls["n"] == 1
    eng._tick_call = orig
    # the engine object survives: close the lost stream, serve a new one
    eng.close_stream(sid)
    sid2 = eng.open_stream(3000)
    eng.push(sid2, x)
    codes2 = []
    while True:
        out = eng.tick()
        if sid2 not in out:
            break
        codes2.append(out[sid2][0])
    np.testing.assert_array_equal(np.stack(codes2), np.stack(codes_ref))


# --- bitpack ------------------------------------------------------------------


def test_bitpack_roundtrip(rng):
    frames, z = 50, 64
    codes = rng.integers(0, 2, size=(frames, z)).astype(np.float32)
    for k in (1, 35, 64):
        masked = codes.copy()
        masked[:, k:] = 0.5
        payload = pack_codes(masked, k)
        assert len(payload) == (frames * k + 7) // 8
        back = unpack_codes(payload, k, frames, z)
        np.testing.assert_array_equal(back, masked)


def test_bitpack_variable_bitrate(rng):
    frames, z = 20, 16
    bits = rng.integers(1, z + 1, size=frames).astype(np.int32)
    codes = rng.integers(0, 2, size=(frames, z)).astype(np.float32)
    masked = codes.copy()
    for t in range(frames):
        masked[t, bits[t]:] = 0.5
    payload = pack_codes(masked, bits)
    assert len(payload) == (int(bits.sum()) + 7) // 8
    back = unpack_codes(payload, bits, frames, z)
    np.testing.assert_array_equal(back, masked)


def test_bitpack_native_matches_numpy(rng):
    frames, z = 30, 64
    codes = rng.integers(0, 2, size=(frames, z)).astype(np.float32)
    bits = rng.integers(1, z + 1, size=frames).astype(np.int32)
    native = _load_native()
    if native is None:
        pytest.skip("cc unavailable")
    import bvsc_tpu.ops.bitpack as bp

    p_native = pack_codes(codes, bits)
    # force the numpy fallback
    bp._lib, bp._tried = None, True
    try:
        p_numpy = pack_codes(codes, bits)
        back_numpy = unpack_codes(p_native, bits, frames, z)
    finally:
        bp._tried = False
        bp._lib = None
    assert p_native == p_numpy
    back_native = unpack_codes(p_native, bits, frames, z)
    np.testing.assert_array_equal(back_native, back_numpy)


def test_bitpack_payload_rate():
    """35 bits/frame at 86.133 frames/s -> 3014.6 bps (the '3 kbps' point)."""
    frames = 8613  # ~100 s
    codes = np.ones((frames, 64), np.float32)
    payload = pack_codes(codes, 35)
    bps = len(payload) * 8 / 100.0
    assert abs(bps - 3014.6) < 1.0


@pytest.mark.slow
def test_engine_sharded_over_mesh_matches_unsharded(codec, rng):
    """Multi-chip serving: batch sharded over an 8-device mesh gives the
    same codes as single-device serving."""
    from bvsc_tpu.parallel.mesh import make_mesh

    L = 768 + 256 * 4
    x = (rng.standard_normal(L) * 0.3).astype(np.float32)

    def run(engine):
        sid = engine.open_stream(3000)
        engine.push(sid, x)
        cs = []
        while True:
            out = engine.tick()
            if sid not in out:
                break
            cs.append(out[sid][0])
        return np.stack(cs)

    c_plain = run(ServingEngine(codec, max_streams=8))
    c_mesh = run(ServingEngine(codec, max_streams=8, mesh=make_mesh(8)))
    np.testing.assert_array_equal(c_mesh, c_plain)


def test_decode_engine_matches_streaming_decoder(codec, rng):
    """One DecodeEngine slot == a dedicated StreamingDecoder on the same
    code/loss sequence; slots are independent; lost frames are concealed
    with no output gap; closed slots reset on reuse."""
    from bvsc_tpu.serve.engine import DecodeEngine
    from bvsc_tpu.streaming import StreamingDecoder

    n = 12
    z = codec.conf.z_dim
    hop = codec.conf.hopsize
    codes_a = (rng.uniform(size=(n, z)) > 0.5).astype(np.float32)
    codes_b = (rng.uniform(size=(n, z)) > 0.5).astype(np.float32)
    lost_a = np.zeros(n, np.float32)
    lost_a[4] = 1.0

    eng = DecodeEngine(codec, max_streams=4)
    sa = eng.open_stream()
    sb = eng.open_stream()
    eng.push(sa, codes_a, lost=lost_a)
    eng.push(sb, codes_b)

    out_a, out_b = [], []
    for _ in range(n):
        res = eng.tick()
        out_a.append(res[sa])
        out_b.append(res[sb])
    assert eng.tick() == {}
    wav_a = np.concatenate(out_a)
    wav_b = np.concatenate(out_b)
    assert wav_a.shape == (n * hop,)

    ref_dec = StreamingDecoder(codec, batch=1)
    ref_a = []
    for t in range(n):
        if lost_a[t]:
            ref_a.append(ref_dec.conceal(1))
        else:
            ref_a.append(ref_dec.feed(codes_a[None, t : t + 1]))
    ref_a = np.concatenate(ref_a, axis=1)[0]
    np.testing.assert_allclose(wav_a, ref_a, atol=1e-5)

    ref_dec_b = StreamingDecoder(codec, batch=1)
    ref_b = ref_dec_b.feed(codes_b[None])[0]
    np.testing.assert_allclose(wav_b, ref_b, atol=1e-5)

    # push_lost conceals with no gap; slot reuse starts fresh
    eng.close_stream(sa)
    sc = eng.open_stream()
    eng.push(sc, codes_b[:2])
    eng.push_lost(sc, 2)
    eng.push(sc, codes_b[4:6])
    outs = [eng.tick()[sc] for _ in range(6)]
    got = np.concatenate(outs)
    assert got.shape == (6 * hop,) and np.isfinite(got).all()
    # the fresh slot's first frames equal a fresh decoder's
    ref_c = StreamingDecoder(codec, batch=1).feed(codes_b[None, :2])[0]
    np.testing.assert_allclose(got[: 2 * hop], ref_c, atol=1e-5)


def test_decode_engine_rejects_mismatched_lost(codec):
    from bvsc_tpu.serve.engine import DecodeEngine

    eng = DecodeEngine(codec, max_streams=2)
    sid = eng.open_stream()
    z = codec.conf.z_dim
    with pytest.raises(ValueError, match="lost shape"):
        eng.push(sid, np.zeros((3, z), np.float32), lost=np.zeros(2))


def test_decode_engine_sharded_over_mesh_matches_unsharded(codec, rng):
    """Multi-chip decode serving: stream batch sharded over an 8-device
    mesh gives the same audio as single-device (incl. a concealed frame)."""
    from bvsc_tpu.parallel.mesh import make_mesh
    from bvsc_tpu.serve.engine import DecodeEngine

    n = 6
    z = codec.conf.z_dim
    codes = (rng.uniform(size=(n, z)) > 0.5).astype(np.float32)
    lost = np.zeros(n, np.float32)
    lost[2] = 1.0

    def run(engine):
        sid = engine.open_stream(conceal_bitrate=500)
        engine.push(sid, codes, lost=lost)
        return np.concatenate([engine.tick()[sid] for _ in range(n)])

    plain = run(DecodeEngine(codec, max_streams=8))
    mesh = run(DecodeEngine(codec, max_streams=8, mesh=make_mesh(8)))
    np.testing.assert_allclose(mesh, plain, atol=1e-6)


def test_engine_respects_config_winsize(rng):
    """ServingEngine must size its rolling window from conf.winsize, not a
    hard-coded 1024 (regression: WIN constant): one slot at winsize=64
    equals a dedicated StreamingCodec."""
    from bvsc_tpu.config import CodecConfig
    from test_vocoder import tiny_cfg

    conf = CodecConfig(
        num_mels=8, h_dim=32, z_dim=12, hopsize=8, winsize=64,
        mel_pad_left=16, var_bit=True,
        vocoder_config=tiny_cfg(),  # total upsample 8 == hopsize
    )
    codec_small = BVRNNCodecModel(config=conf, seed=5, length_bucket=4)
    L = (64 - 16) + 8 * 6
    x = (rng.standard_normal(L) * 0.3).astype(np.float32)

    eng = ServingEngine(codec_small, max_streams=2)
    sid = eng.open_stream(500)
    eng.push(sid, x)
    wav = []
    while True:
        out = eng.tick()
        if sid not in out:
            break
        wav.append(out[sid][1])
    wav = np.concatenate(wav)

    sc = StreamingCodec(codec_small, batch=1, bitrate=500)
    wav_ref = sc.process(x[None, :])
    np.testing.assert_allclose(wav, wav_ref[0, : wav.shape[0]], atol=1e-5)
    assert wav.shape[0] > 0
