"""Adaptive entropy-coded BVSP code payloads (serve/entropy_wire.py).

The wire carries the same information either way — every test's ground
truth is the raw-path result, which itself equals a direct engine run
(test_daemon.py).  Size wins are asserted where the statistics warrant
them: synthetic biased streams at the protocol level, and the demo
checkpoint's real code streams at the coder level (slow).
"""

import numpy as np
import pytest

from bvsc_tpu.codec import BVRNNCodecModel
from bvsc_tpu.serve import protocol as P
from bvsc_tpu.serve.client import CodecClient, ServerError
from bvsc_tpu.serve.daemon import CodecDaemon
from bvsc_tpu.serve.engine import ServingEngine
from bvsc_tpu.serve.entropy_wire import AdaptiveBitModel, AdaptiveCodesCoder
from test_codec import small_conf
from test_daemon import BITRATE, solo_decode_run, solo_engine_run


@pytest.fixture(scope="module")
def codec():
    return BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16)


@pytest.fixture()
def daemon(codec):
    d = CodecDaemon(codec, port=0, max_streams=4)
    d.start()
    yield d
    d.close()


# --- coder unit level --------------------------------------------------------


def test_adaptive_coder_roundtrip_and_state_chaining(rng):
    """Blocks decode exactly with a mirrored coder; counts persist across
    blocks (decoding out of order or with a fresh coder must fail or
    mismatch); corrupt payloads raise."""
    z = 12
    enc, dec = AdaptiveCodesCoder(z), AdaptiveCodesCoder(z)
    blocks = []
    for blk in range(12):
        n = int(rng.integers(1, 9))
        k = 0 if blk == 5 else int(rng.integers(1, z + 1))
        p = np.linspace(0.02, 0.9, z)
        codes = np.full((n, z), 0.5, np.float32)
        codes[:, :k] = (rng.random((n, k)) < p[:k]).astype(np.float32)
        body = enc.encode_block(codes, k)
        if k == 0:
            assert body == b""
        blocks.append((body, n, k, codes))
    for body, n, k, codes in blocks:
        np.testing.assert_array_equal(dec.decode_block(body, n, k), codes)

    # a fresh coder (wrong state) must not silently decode mid-stream blocks
    body, n, k, codes = blocks[-1]
    fresh = AdaptiveCodesCoder(z)
    try:
        wrong = fresh.decode_block(body, n, k)
        assert not np.array_equal(wrong, codes)
    except ValueError:
        pass  # state-unwind check tripping is equally acceptable

    # corruption detection (rANS unwind)
    enc2, dec2 = AdaptiveCodesCoder(z), AdaptiveCodesCoder(z)
    body = enc2.encode_block(np.zeros((8, z), np.float32), 7)
    with pytest.raises(ValueError):
        dec2.decode_block(body[:-1] + bytes([body[-1] ^ 0xFF]), 8, 7)


def test_adaptive_model_integer_determinism():
    """The probability model is pure integer arithmetic: a replayed bit
    sequence reproduces byte-identical probabilities (the cross-machine
    determinism contract the float prior coder cannot make)."""
    rng = np.random.default_rng(7)
    bits = (rng.random((500, 6)) < 0.2).astype(np.uint8)
    m1, m2 = AdaptiveBitModel(6), AdaptiveBitModel(6)
    for row in bits:
        np.testing.assert_array_equal(m1.probs_q16(6), m2.probs_q16(6))
        m1.update(row, 6)
        m2.update(row, 6)
    assert m1.c0.max() < 1024 and m1.c1.max() < 1024  # halving bounds counts


# --- wire level --------------------------------------------------------------


def test_encode_entropy_codes_bit_exact(codec, daemon, rng):
    """Entropy-negotiated encode stream delivers the same codes as the raw
    path (== direct engine run), through block aggregation + drain flush."""
    x = (rng.standard_normal(768 + 256 * 9) * 0.3).astype(np.float32)
    codes_ref, _ = solo_engine_run(codec, x, BITRATE)
    kbits = int(np.ceil(codec.bits_per_frame(BITRATE)))

    with CodecClient("127.0.0.1", daemon.port, mode="encode", bitrate=BITRATE,
                     timeout=300, entropy=True, entropy_block=4) as c:
        c.send_audio(x)
        c.close_input()
        out = c.drain()
        stats = dict(c.entropy_stats)
    assert out["codes"].shape[0] == codes_ref.shape[0]
    np.testing.assert_array_equal(out["codes"][:, :kbits],
                                  codes_ref[:, :kbits])
    assert (out["codes"][:, kbits:] == 0.5).all()
    # 12 frames at block 4 -> 3 messages (the last via the drain flush)
    assert out["bits"] == [kbits] * 3
    assert stats["wire_payload_bytes"] > 0


def test_encode_entropy_rate_switch_flushes(codec, daemon, rng):
    """A mid-stream SET_BITRATE flushes the pending sub-block so every
    message carries one bits value; codes equal a direct engine run with
    the same frame-aligned switch."""
    block = 4
    x1 = (rng.standard_normal(768 + 256 * 3) * 0.3).astype(np.float32)  # 4 fr
    x2 = (rng.standard_normal(256 * 3) * 0.3).astype(np.float32)  # 3 fr (+2)
    b2 = 900
    k1 = int(np.ceil(codec.bits_per_frame(BITRATE)))
    k2 = int(np.ceil(codec.bits_per_frame(b2)))

    eng = ServingEngine(codec, max_streams=4)
    sid = eng.open_stream(BITRATE)
    eng.push(sid, x1)
    cs = [eng.tick()[sid][0] for _ in range(4)]
    eng.set_bitrate(sid, b2)
    eng.push(sid, x2)
    eng.begin_flush(sid)
    while True:
        out = eng.tick()
        if sid not in out:
            break
        cs.append(out[sid][0])
    codes_ref = np.stack(cs)

    with CodecClient("127.0.0.1", daemon.port, mode="encode", bitrate=BITRATE,
                     timeout=300, entropy=True, entropy_block=block) as c:
        c.send_audio(x1)
        kind, (codes1, bits1) = c.recv()  # the first full block
        assert kind == "codes" and bits1 == k1 and codes1.shape[0] == block
        c.set_bitrate(b2)
        c.send_audio(x2)
        c.close_input()
        out = c.drain()
        codes_all = np.concatenate([codes1, out["codes"]])
    assert codes_all.shape == codes_ref.shape
    np.testing.assert_array_equal(codes_all, codes_ref)
    assert out["bits"] == [k2, k2]  # 5 post-switch frames -> 4 + 1 (flush)


def test_decode_entropy_matches_raw_and_shrinks_payload(codec, daemon, rng):
    """Biased code streams through an entropy decode session: audio equals
    the raw path bit-for-bit and the wire payload shrinks >= 20 % (the
    VERDICT r2 #5 bar) — interleaved with LOST concealment, which carries
    no bits and must not desync the coder."""
    z = codec.conf.z_dim
    # biased like trained codes: position j mostly 0, a few busy positions
    p = np.array([0.5, 0.3, 0.1, 0.05, 0.02, 0.02, 0.02] + [0.02] * (z - 7))
    frames = []
    for i in range(60):
        if i in (20, 21, 40):
            frames.append((None, True))
        else:
            frames.append(((rng.random(z) < p).astype(np.float32), False))
    wav_ref = solo_decode_run(codec, frames)

    def run(entropy):
        with CodecClient("127.0.0.1", daemon.port, mode="decode",
                         bitrate=None, timeout=300, entropy=entropy) as c:
            pend = []
            for codes, lost in frames:
                if lost:
                    if pend:  # keep arrival order around the loss report
                        c.send_codes(np.stack(pend), bits=z)
                        pend = []
                    c.send_lost(1)
                else:
                    pend.append(codes)
            if pend:
                c.send_codes(np.stack(pend), bits=z)
            c.close_input()
            return c.drain()["audio"], dict(c.entropy_stats)

    wav_raw, _ = run(entropy=False)
    wav_ent, stats = run(entropy=True)
    np.testing.assert_array_equal(wav_raw, wav_ref)
    np.testing.assert_array_equal(wav_ent, wav_ref)
    saving = 1 - stats["wire_payload_bytes"] / stats["raw_payload_bytes"]
    assert saving >= 0.20, stats


def test_entropy_rejected_for_resynth(codec, daemon):
    with pytest.raises(ValueError):
        CodecClient("127.0.0.1", daemon.port, mode="resynth", bitrate=BITRATE,
                    entropy=True)
    # a hand-rolled resynth HELLO with the flag is a protocol error
    import socket

    with socket.create_connection(("127.0.0.1", daemon.port), timeout=30) as s:
        P.write_msg(s, P.MSG_HELLO,
                    P.pack_hello(P.MODE_RESYNTH, BITRATE,
                                 flags=P.FLAG_ENTROPY))
        msg = P.read_msg(s)
        assert msg is not None and msg[0] == P.MSG_ERROR


def test_codes_ent_without_negotiation_rejected(codec, daemon):
    import socket

    with socket.create_connection(("127.0.0.1", daemon.port), timeout=30) as s:
        P.write_msg(s, P.MSG_HELLO, P.pack_hello(P.MODE_DECODE, None))
        msg = P.read_msg(s)
        assert msg is not None and msg[0] == P.MSG_OPENED
        P.write_msg(s, P.MSG_CODES_ENT, P.pack_codes_ent_msg(b"\0\0\0\0", 1, 4))
        msg = P.read_msg(s)
        assert msg is not None and msg[0] == P.MSG_ERROR


def test_corrupt_entropy_payload_kills_stream_not_daemon(codec, daemon, rng):
    import socket

    with socket.create_connection(("127.0.0.1", daemon.port), timeout=30) as s:
        P.write_msg(s, P.MSG_HELLO,
                    P.pack_hello(P.MODE_DECODE, None, flags=P.FLAG_ENTROPY))
        msg = P.read_msg(s)
        assert msg is not None and msg[0] == P.MSG_OPENED
        P.write_msg(s, P.MSG_CODES_ENT,
                    P.pack_codes_ent_msg(b"\xff\xff\xff\xff\xff", 3, 7))
        msg = P.read_msg(s)
        assert msg is not None and msg[0] == P.MSG_ERROR
    # daemon survives: a fresh stream still works
    z = codec.conf.z_dim
    frames = [((rng.random(z) < 0.2).astype(np.float32), False)] * 3
    wav_ref = solo_decode_run(codec, frames)
    with CodecClient("127.0.0.1", daemon.port, mode="decode", bitrate=None,
                     timeout=300, entropy=True) as c:
        for codes, _ in frames:
            c.send_codes(codes[None, :], bits=z)
        c.close_input()
        np.testing.assert_array_equal(c.drain()["audio"], wav_ref)


# --- real-model payload reduction (the headline number) ----------------------


@pytest.mark.slow
def test_demo_checkpoint_wire_savings():
    """The committed demo checkpoint's real code streams, blocked like the
    wire (entropy_block=8): the adaptive coder must beat raw first-k
    packing by >= 20 % at every published rate (measured 2026-08-19:
    ~69-93 %; the trained Bernoulli-KL leaves positions heavily biased)."""
    import os

    from bvsc_tpu.data.audio import load_wav

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wav_dir = os.path.join(repo, "data_local", "wavs")
    if not os.path.isdir(wav_dir):
        import subprocess
        import sys

        subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "prepare_demo_data.py")],
            check=True, cwd=repo)
    codec = BVRNNCodecModel(
        bvrnn_chkpt_path=os.path.join(
            repo, "chkpts", "bvsc_bvrnn_demo_step3000_f16.npz"),
        vocoder_params={},
    )
    z = codec.conf.z_dim
    for bps in (1378.0, 3000.0, 5512.0):
        k = int(np.ceil(codec.bits_per_frame(bps)))
        raw = wire = 0
        enc = AdaptiveCodesCoder(z)
        dec = AdaptiveCodesCoder(z)
        for stim in ("stim_15", "stim_16"):
            x = np.asarray(
                load_wav(os.path.join(wav_dir, stim + ".wav"), 22050)[0],
                np.float32)
            codes = np.asarray(codec.encode(x[None, :], bps))[0]
            for i in range(0, codes.shape[0], 8):
                blk = codes[i : i + 8]
                body = enc.encode_block(blk, k)
                np.testing.assert_array_equal(
                    dec.decode_block(body, blk.shape[0], k)[:, :k],
                    blk[:, :k])
                raw += (blk.shape[0] * k + 7) // 8
                wire += len(body)
        saving = 1 - wire / raw
        assert saving >= 0.20, (bps, raw, wire)
