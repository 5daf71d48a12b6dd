"""BVSP/1 serving daemon + client tests (loopback TCP on the CPU harness).

The daemon multiplexes connections onto the batched engines, so parity
targets are the engines themselves (whose equality with the streaming
classes is covered in test_serving.py / test_plc.py): anything the daemon
serves over the wire must equal a direct engine run bit-for-bit — the wire
carries float32 audio and the packed first-k bitstream, both lossless.
"""

import socket
import struct
import threading

import numpy as np
import pytest

from bvsc_tpu.codec import BVRNNCodecModel
from bvsc_tpu.serve import protocol as P
from bvsc_tpu.serve.client import CodecClient, ServerError
from bvsc_tpu.serve.daemon import CodecDaemon
from bvsc_tpu.serve.engine import DecodeEngine, ServingEngine
from test_codec import small_conf

BITRATE = 600  # -> 7 bits/frame on z_dim=12: exercises the VBR midpoints


@pytest.fixture(scope="module")
def codec():
    return BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16)


@pytest.fixture()
def daemon(codec):
    d = CodecDaemon(codec, port=0, max_streams=4)
    d.start()
    yield d
    d.close()


def solo_engine_run(codec, x, bitrate):
    """Direct ServingEngine single-slot run, flushed like the daemon's
    CLOSE handling -> (codes (T,z), wav (n,))."""
    eng = ServingEngine(codec, max_streams=4)
    sid = eng.open_stream(bitrate)
    eng.push(sid, x)
    eng.begin_flush(sid)
    cs, ws = [], []
    while True:
        out = eng.tick()
        if sid not in out:
            break
        c, w = out[sid]
        cs.append(c)
        ws.append(w)
    return np.stack(cs), np.concatenate(ws)


def solo_decode_run(codec, frames):
    """Direct DecodeEngine run over [(codes, lost)] frames -> wav."""
    eng = DecodeEngine(codec, max_streams=4)
    sid = eng.open_stream()
    for codes, lost in frames:
        if lost:
            eng.push_lost(sid, 1)
        else:
            eng.push(sid, codes[None, :])
    ws = []
    while True:
        out = eng.tick()
        if sid not in out:
            break
        ws.append(out[sid])
    return np.concatenate(ws)


def test_fixed_bitrate_codec_rejects_partial_allocation():
    """var_bit=false models emit z_dim informative bits per frame; the
    daemon must reject wire allocations that would truncate them (silent
    decode corruption), and accept exactly the full rate."""
    import dataclasses

    conf = dataclasses.replace(small_conf(), var_bit=False)
    codec = BVRNNCodecModel(config=conf, seed=3, length_bucket=16)
    full_bps = conf.z_dim * conf.fs / conf.hopsize
    with CodecDaemon(codec, port=0, max_streams=2) as d:
        with pytest.raises(ServerError, match="fixed-bitrate"):
            CodecClient("127.0.0.1", d.port, mode="encode", bitrate=600,
                        timeout=300)
        with CodecClient("127.0.0.1", d.port, mode="encode",
                         bitrate=full_bps, timeout=300) as c:
            assert c.z_dim == conf.z_dim


def test_resynth_roundtrip_matches_engine(codec, daemon, rng):
    x = (rng.standard_normal(768 + 256 * 5) * 0.3).astype(np.float32)
    codes_ref, wav_ref = solo_engine_run(codec, x, BITRATE)

    with CodecClient("127.0.0.1", daemon.port, mode="resynth",
                     bitrate=BITRATE, timeout=300) as c:
        assert c.z_dim == codec.conf.z_dim and c.hop == codec.conf.hopsize
        c.send_audio(x)
        c.close_input()
        out = c.drain()
    np.testing.assert_array_equal(out["audio"], wav_ref)
    assert out["codes"].shape == (0, codec.conf.z_dim)


def test_encode_mode_codes_bit_exact(codec, daemon, rng):
    x = (rng.standard_normal(768 + 256 * 5) * 0.3).astype(np.float32)
    codes_ref, _ = solo_engine_run(codec, x, BITRATE)
    kbits = int(np.ceil(codec.bits_per_frame(BITRATE)))

    with CodecClient("127.0.0.1", daemon.port, mode="encode",
                     bitrate=BITRATE, timeout=300) as c:
        c.send_audio(x)
        c.close_input()
        out = c.drain()
    assert out["bits"] == [kbits] * codes_ref.shape[0]
    # wire codes: transmitted first-k bits exact, untransmitted == 0.5
    np.testing.assert_array_equal(out["codes"][:, :kbits],
                                  codes_ref[:, :kbits])
    assert (out["codes"][:, kbits:] == 0.5).all()
    assert out["audio"].size == 0


def test_decode_mode_with_plc_matches_engine(codec, daemon, rng):
    z = codec.conf.z_dim
    frames = [(rng.integers(0, 2, z).astype(np.float32), False)
              for _ in range(4)]
    frames += [(None, True), (None, True)]  # two lost packets
    frames += [(rng.integers(0, 2, z).astype(np.float32), False)
               for _ in range(3)]
    wav_ref = solo_decode_run(codec, frames)

    with CodecClient("127.0.0.1", daemon.port, mode="decode",
                     bitrate=None, timeout=300) as c:
        for codes, lost in frames:
            if lost:
                c.send_lost(1)
            else:
                c.send_codes(codes[None, :], bits=z)
        c.close_input()
        out = c.drain()
    np.testing.assert_array_equal(out["audio"], wav_ref)


def test_mid_stream_bitrate_switch(codec, daemon, rng):
    """Client-driven rate switch lands on a deterministic frame boundary
    when the client waits for its outputs before switching."""
    x = (rng.standard_normal(768 + 256 * 5) * 0.3).astype(np.float32)
    head, tail = x[: 768 + 256 * 2], x[768 + 256 * 2 :]

    # reference run: one engine, switch after 3 emitted frames
    eng = ServingEngine(codec, max_streams=4)
    sid = eng.open_stream(BITRATE)
    eng.push(sid, x)
    cs = []
    for _ in range(3):
        cs.append(eng.tick()[sid][0])
    eng.set_bitrate(sid, 3000)
    eng.begin_flush(sid)  # the daemon flushes on CLOSE
    while True:
        out = eng.tick()
        if sid not in out:
            break
        cs.append(out[sid][0])
    codes_ref = np.stack(cs)

    with CodecClient("127.0.0.1", daemon.port, mode="encode",
                     bitrate=BITRATE, timeout=300) as c:
        c.send_audio(head)  # exactly 3 frames' worth
        got = [c.recv() for _ in range(3)]  # wait until all 3 consumed
        c.set_bitrate(3000)
        c.send_audio(tail)
        c.close_input()
        rest = c.drain()
    kbits_low = int(np.ceil(codec.bits_per_frame(BITRATE)))
    head_codes = np.concatenate([v[0] for _, v in got], axis=0)
    np.testing.assert_array_equal(head_codes[:, :kbits_low],
                                  codes_ref[:3, :kbits_low])
    kbits_hi = min(int(np.ceil(codec.bits_per_frame(3000))), codec.conf.z_dim)
    np.testing.assert_array_equal(rest["codes"][:, :kbits_hi],
                                  codes_ref[3:, :kbits_hi])


def test_concurrent_clients_are_independent(codec, daemon, rng):
    """Three modes at once; every stream equals its solo run."""
    x1 = (rng.standard_normal(768 + 256 * 4) * 0.3).astype(np.float32)
    x2 = (rng.standard_normal(768 + 256 * 4) * 0.2).astype(np.float32)
    z = codec.conf.z_dim
    dframes = [(rng.integers(0, 2, z).astype(np.float32), False)
               for _ in range(5)]

    codes1, wav1 = solo_engine_run(codec, x1, BITRATE)
    codes2, _ = solo_engine_run(codec, x2, 3000)
    wav3 = solo_decode_run(codec, dframes)

    results = {}

    def run(name, mode, bitrate, feed):
        with CodecClient("127.0.0.1", daemon.port, mode=mode,
                         bitrate=bitrate, timeout=300) as c:
            feed(c)
            c.close_input()
            results[name] = c.drain()

    threads = [
        threading.Thread(target=run, args=(
            "resynth", "resynth", BITRATE, lambda c: c.send_audio(x1))),
        threading.Thread(target=run, args=(
            "encode", "encode", 3000, lambda c: c.send_audio(x2))),
        threading.Thread(target=run, args=(
            "decode", "decode", None,
            lambda c: [c.send_codes(f[None, :], bits=z) for f, _ in dframes])),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "client thread hung"

    np.testing.assert_array_equal(results["resynth"]["audio"], wav1)
    kbits = min(int(np.ceil(codec.bits_per_frame(3000))), z)
    np.testing.assert_array_equal(results["encode"]["codes"][:, :kbits],
                                  codes2[:, :kbits])
    np.testing.assert_array_equal(results["decode"]["audio"], wav3)


def test_bad_magic_rejected(daemon):
    s = socket.create_connection(("127.0.0.1", daemon.port), timeout=60)
    try:
        P.write_msg(s, P.MSG_HELLO, struct.pack("<4sBBf", b"NOPE", 1, 0, 3000.0))
        msg = P.read_msg(s)
        assert msg is not None and msg[0] == P.MSG_ERROR
        assert b"magic" in msg[1]
        assert P.read_msg(s) is None  # server closed
    finally:
        s.close()


def test_oversized_payload_rejected(daemon):
    s = socket.create_connection(("127.0.0.1", daemon.port), timeout=60)
    try:
        # header announces a LOST payload far beyond its 2-byte bound
        s.sendall(struct.pack("<BI", P.MSG_LOST, 1 << 30))
        msg = P.read_msg(s)
        assert msg is not None and msg[0] == P.MSG_ERROR
    finally:
        s.close()


def test_wrong_mode_message_rejected(codec, daemon):
    with pytest.raises(ServerError):
        c = CodecClient("127.0.0.1", daemon.port, mode="encode",
                        bitrate=BITRATE, timeout=60)
        try:
            c.send_codes(np.zeros((1, codec.conf.z_dim), np.float32),
                         bits=codec.conf.z_dim)  # not valid on encode streams
            c.drain()
        finally:
            c.close()


def test_slot_exhaustion_reports_error(daemon):
    clients = [CodecClient("127.0.0.1", daemon.port, mode="resynth",
                           bitrate=3000, timeout=60) for _ in range(4)]
    try:
        with pytest.raises(ServerError):
            CodecClient("127.0.0.1", daemon.port, mode="resynth",
                        bitrate=3000, timeout=60)
    finally:
        for c in clients:
            c.close()


def test_client_vanishing_frees_slot(codec, daemon):
    """EOF without CLOSE frees the slot for the next client."""
    for _ in range(6):  # > max_streams if slots leaked
        c = CodecClient("127.0.0.1", daemon.port, mode="resynth",
                        bitrate=3000, timeout=60)
        c.close()  # abrupt: no MSG_CLOSE
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if not daemon._by_slot:
            break
        time.sleep(0.05)
    assert not daemon._by_slot, "slots leaked after abrupt disconnects"


def test_encode_hello_requires_bitrate(daemon):
    with pytest.raises(ServerError):
        CodecClient("127.0.0.1", daemon.port, mode="encode", bitrate=None,
                    timeout=60)


@pytest.mark.parametrize("bad", [-5.0, 1e12, float("inf")])
def test_invalid_hello_bitrate_rejected(daemon, bad):
    """Out-of-range bitrates must be rejected at HELLO, never reach the
    shared tick loop (a crash there would stall every stream)."""
    with pytest.raises(ServerError):
        CodecClient("127.0.0.1", daemon.port, mode="encode", bitrate=bad,
                    timeout=60)


def test_invalid_set_bitrate_kills_stream_not_daemon(codec, daemon, rng):
    x = (rng.standard_normal(768 + 256) * 0.3).astype(np.float32)
    with pytest.raises(ServerError):
        with CodecClient("127.0.0.1", daemon.port, mode="encode",
                         bitrate=BITRATE, timeout=60) as c:
            c.set_bitrate(float("nan"))
            c.send_audio(x)
            c.drain()
    # the daemon is still healthy for the next client
    codes_ref, _ = solo_engine_run(codec, x, BITRATE)
    with CodecClient("127.0.0.1", daemon.port, mode="encode",
                     bitrate=BITRATE, timeout=300) as c:
        c.send_audio(x)
        c.close_input()
        out = c.drain()
    k = int(np.ceil(codec.bits_per_frame(BITRATE)))
    np.testing.assert_array_equal(out["codes"][:, :k], codes_ref[:, :k])


def test_max_streams_bound(codec):
    with pytest.raises(ValueError):
        CodecDaemon(codec, max_streams=70000)


def test_audio_chunking_roundtrip(rng):
    from bvsc_tpu.serve import protocol as proto

    x = rng.standard_normal(proto.MAX_AUDIO_SAMPLES * 2 + 17).astype(np.float32)
    chunks = list(proto.iter_audio_chunks(x))
    assert all(c.size <= proto.MAX_AUDIO_SAMPLES for c in chunks)
    assert all(len(proto.pack_audio(c)) <= proto.MAX_PAYLOAD[proto.MSG_AUDIO]
               for c in chunks)
    np.testing.assert_array_equal(np.concatenate(chunks), x)
    out = np.concatenate(
        [proto.unpack_audio(proto.pack_audio(c)) for c in chunks])
    np.testing.assert_array_equal(out, x)
    assert [c.size for c in proto.iter_audio_chunks(np.zeros(0))] == [0]


def test_close_flush_matches_fused_packet_codec(codec, daemon, rng):
    """CLOSE drains through the one-shot right reflect padding: the wire
    output equals FusedPacketCodec process()+flush() — including the two
    tail frames the pre-flush daemon silently truncated — even with a
    sub-hop input remainder."""
    from bvsc_tpu.streaming import FusedPacketCodec

    L = 768 + 256 * 4 + 100  # deliberately NOT a hop multiple
    x = (rng.standard_normal(L) * 0.3).astype(np.float32)

    fpc = FusedPacketCodec(codec, batch=1, bitrate=BITRATE)
    ref = np.concatenate([fpc.process(x[None, :]), fpc.flush()], axis=1)[0]

    with CodecClient("127.0.0.1", daemon.port, mode="resynth",
                     bitrate=BITRATE, timeout=300) as c:
        c.send_audio(x)
        c.close_input()
        out = c.drain()
    np.testing.assert_allclose(out["audio"], ref, atol=1e-5)


def test_decode_mode_fixed_bitrate_codes_rejected():
    """The fixed-bitrate wire guard must also hold on the decode path: a
    CODES message carrying fewer than z_dim bits/frame would feed midpoint
    masks to a model never trained with them."""
    import dataclasses

    conf = dataclasses.replace(small_conf(), var_bit=False)
    codec = BVRNNCodecModel(config=conf, seed=3, length_bucket=16)
    z = conf.z_dim
    with CodecDaemon(codec, port=0, max_streams=2) as d:
        with pytest.raises(ServerError, match="fixed-bitrate"):
            with CodecClient("127.0.0.1", d.port, mode="decode",
                             bitrate=None, timeout=300) as c:
                c.send_codes(np.zeros((1, z), np.float32), bits=7)
                c.drain()
        # the full allocation still works
        with CodecClient("127.0.0.1", d.port, mode="decode",
                         bitrate=None, timeout=300) as c:
            c.send_codes(np.zeros((2, z), np.float32), bits=z)
            c.close_input()
            out = c.drain()
        assert out["audio"].size == 2 * conf.hopsize


def test_slow_reader_evicted_without_stalling_others(codec, rng):
    """A client that stops reading fills the kernel buffers, then its
    bounded send queue, and is evicted; every other stream keeps flowing
    meanwhile (the ticker only does non-blocking enqueues — a stalled
    socket blocks its own writer thread, nothing else)."""
    import time

    x = (rng.standard_normal(768 + 256 * 40) * 0.3).astype(np.float32)
    codes_ref, wav_ref = solo_engine_run(codec, x, BITRATE)
    # the stalled peer gets a LONGER input than the healthy one: its output
    # (~200 KB) overflows the 64 KB send queue even if the send timeout
    # races, while the healthy stream's ~44 KB output can NEVER overflow it
    # — so a CPU-starved writer thread (loaded 1-core CI host) cannot evict
    # the healthy reader and flake the test
    x_stalled = (rng.standard_normal(768 + 256 * 200) * 0.3).astype(np.float32)

    with CodecDaemon(codec, port=0, max_streams=4, send_queue_bytes=65536,
                     send_timeout=2.0, sndbuf=4096) as d:
        # raw stalled peer with a tiny receive buffer (set before connect),
        # so the kernel absorbs only a few frames before backpressure hits
        s = socket.socket()
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 2048)
        s.settimeout(60)
        try:
            s.connect(("127.0.0.1", d.port))
            P.write_msg(s, P.MSG_HELLO, P.pack_hello(P.MODE_RESYNTH, BITRATE))
            msg = P.read_msg(s)
            assert msg is not None and msg[0] == P.MSG_OPENED
            P.write_msg(s, P.MSG_AUDIO, P.pack_audio(x_stalled))  # never read

            # healthy client on the same daemon completes normally while
            # the stalled stream is wedging its own writer
            with CodecClient("127.0.0.1", d.port, mode="resynth",
                             bitrate=BITRATE, timeout=300) as c:
                c.send_audio(x)
                c.close_input()
                out = c.drain()
            np.testing.assert_array_equal(out["audio"], wav_ref)

            # the stalled connection gets torn down (queue overflow or
            # send-timeout) and its slot freed
            deadline = time.time() + 120
            while time.time() < deadline and d._by_slot:
                time.sleep(0.05)
            assert not d._by_slot, "slow reader was not evicted"
        finally:
            s.close()


def test_input_backlog_cap_rejected(codec, rng):
    """Unread input backlog beyond max_buffered_seconds is a protocol
    error, not unbounded host memory."""
    with CodecDaemon(codec, port=0, max_streams=2,
                     max_buffered_seconds=0.05) as d:  # cap ~1102 samples
        with pytest.raises(ServerError, match="backlog"):
            with CodecClient("127.0.0.1", d.port, mode="resynth",
                             bitrate=BITRATE, timeout=300) as c:
                c.send_audio(np.zeros(4096, np.float32))
                c.drain()


def test_garbage_never_crashes_daemon(codec, daemon, rng):
    """Random bytes at the socket must be rejected cleanly (ERROR or close),
    never crash the daemon or leak slots: a valid client still works after."""
    import time

    for i in range(16):
        s = socket.create_connection(("127.0.0.1", daemon.port), timeout=60)
        try:
            # the server may RST mid-send once it spots the garbage — any
            # OSError on our side is acceptable; the invariant under test is
            # the daemon's health afterwards
            try:
                s.sendall(rng.integers(0, 256, rng.integers(1, 200),
                                       dtype=np.uint8).tobytes())
                s.shutdown(socket.SHUT_WR)
                s.settimeout(10)
                while s.recv(4096):
                    pass
            except OSError:
                pass
        finally:
            s.close()
    deadline = time.time() + 60
    while time.time() < deadline and daemon._by_slot:
        time.sleep(0.05)
    assert not daemon._by_slot, "garbage connections leaked slots"

    x = (rng.standard_normal(768 + 256) * 0.3).astype(np.float32)
    codes_ref, wav_ref = solo_engine_run(codec, x, BITRATE)
    with CodecClient("127.0.0.1", daemon.port, mode="resynth",
                     bitrate=BITRATE, timeout=300) as c:
        c.send_audio(x)
        c.close_input()
        out = c.drain()
    np.testing.assert_array_equal(out["audio"], wav_ref)
