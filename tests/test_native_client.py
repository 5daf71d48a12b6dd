"""Native C BVSP client (bvsc_tpu/native/bvsp_client.c) vs the Python client.

The C client is the zero-Python deployment path; everything it puts on or
reads off the wire must equal the Python client bit-for-bit.  The daemon
(and through it the batched engines) is the shared oracle.
"""

import shutil
import struct

import numpy as np
import pytest

from bvsc_tpu.codec import BVRNNCodecModel
from bvsc_tpu.serve import protocol as P
from bvsc_tpu.serve.client import CodecClient
from bvsc_tpu.serve.daemon import CodecDaemon
from bvsc_tpu.serve.native_client import client_binary, run_native_client
from test_codec import small_conf

BITRATE = 600

pytestmark = pytest.mark.skipif(
    shutil.which("cc") is None, reason="no C toolchain"
)


@pytest.fixture(scope="module")
def codec():
    return BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16)


@pytest.fixture()
def daemon(codec):
    d = CodecDaemon(codec, port=0, max_streams=4)
    d.start()
    yield d
    d.close()


def test_binary_builds_and_reports_usage():
    exe = client_binary()
    import subprocess

    proc = subprocess.run([exe], capture_output=True)
    assert proc.returncode == 1
    assert b"usage" in proc.stderr


def test_resynth_equals_python_client(codec, daemon, rng):
    x = (rng.standard_normal(768 + 256 * 5) * 0.3).astype(np.float32)
    with CodecClient("127.0.0.1", daemon.port, mode="resynth",
                     bitrate=BITRATE, timeout=300) as c:
        c.send_audio(x)
        c.close_input()
        ref = c.drain()["audio"]

    proc = run_native_client("127.0.0.1", daemon.port, "resynth", BITRATE,
                             x.astype("<f4").tobytes(), timeout=300)
    assert proc.returncode == 0, proc.stderr.decode()
    out = np.frombuffer(proc.stdout, "<f4")
    np.testing.assert_array_equal(out, ref)


def _parse_bvspf(blob: bytes):
    """-> list of (type, payload) wire frames from a .bvspf byte stream."""
    frames, pos = [], 0
    while pos < len(blob):
        t, n = struct.unpack_from("<BI", blob, pos)
        pos += 5
        frames.append((t, blob[pos : pos + n]))
        assert len(frames[-1][1]) == n, "truncated .bvspf"
        pos += n
    return frames


def test_encode_equals_python_client(codec, daemon, rng):
    x = (rng.standard_normal(768 + 256 * 5) * 0.3).astype(np.float32)
    with CodecClient("127.0.0.1", daemon.port, mode="encode",
                     bitrate=BITRATE, timeout=300) as c:
        c.send_audio(x)
        c.close_input()
        ref = c.drain()

    proc = run_native_client("127.0.0.1", daemon.port, "encode", BITRATE,
                             x.astype("<f4").tobytes(), timeout=300)
    assert proc.returncode == 0, proc.stderr.decode()
    frames = _parse_bvspf(proc.stdout)
    assert all(t == P.MSG_CODES_OUT for t, _ in frames)
    codes, bits = [], []
    for _, payload in frames:
        c_frame, b = P.unpack_codes_msg(payload, codec.conf.z_dim)
        codes.append(c_frame)
        bits.append(b)
    np.testing.assert_array_equal(np.concatenate(codes, axis=0), ref["codes"])
    assert bits == ref["bits"]


def test_decode_with_plc_equals_python_client(codec, daemon, rng):
    z = codec.conf.z_dim
    frames = [(rng.integers(0, 2, z).astype(np.float32), False)
              for _ in range(4)]
    frames += [(None, True)]
    frames += [(rng.integers(0, 2, z).astype(np.float32), False)
               for _ in range(3)]

    with CodecClient("127.0.0.1", daemon.port, mode="decode",
                     bitrate=None, timeout=300) as c:
        for codes, lost in frames:
            if lost:
                c.send_lost(1)
            else:
                c.send_codes(codes[None, :], bits=z)
        c.close_input()
        ref = c.drain()["audio"]

    blob = b""
    for codes, lost in frames:
        if lost:
            payload = P.pack_u16(1)
            blob += struct.pack("<BI", P.MSG_LOST, len(payload)) + payload
        else:
            payload = P.pack_codes_msg(codes[None, :], bits=z)
            blob += struct.pack("<BI", P.MSG_CODES, len(payload)) + payload

    proc = run_native_client("127.0.0.1", daemon.port, "decode", None,
                             blob, timeout=300)
    assert proc.returncode == 0, proc.stderr.decode()
    out = np.frombuffer(proc.stdout, "<f4")
    np.testing.assert_array_equal(out, ref)


def _fake_server(behavior):
    """One-connection fake BVSP server; returns (port, thread)."""
    import socket as _socket
    import threading

    srv = _socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def run():
        conn, _ = srv.accept()
        with conn:
            behavior(conn)
        srv.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return port, t


def test_premature_server_close_is_not_success(rng):
    """A server that answers OPENED then closes mid-stream must NOT yield
    exit 0 — truncated output would otherwise look like success."""
    def behavior(conn):
        P.read_msg(conn)  # HELLO
        P.write_msg(conn, P.MSG_OPENED, P.pack_opened(0, 12, 16))
        # half an AUDIO_OUT frame, then vanish
        conn.sendall(struct.pack("<BI", P.MSG_AUDIO_OUT, 64))
        conn.sendall(b"\x00" * 8)

    port, t = _fake_server(behavior)
    x = np.zeros(256, np.float32)
    proc = run_native_client("127.0.0.1", port, "resynth", 600,
                             x.tobytes(), timeout=60)
    t.join(timeout=10)
    assert proc.returncode == 3
    assert (b"mid-message" in proc.stderr
            or b"before the stream" in proc.stderr
            or b"connection error" in proc.stderr)


def test_clean_close_without_our_close_is_error():
    """Early clean FIN (before the client's input was consumed/CLOSEd)
    exits 3 with a truncation warning."""
    def behavior(conn):
        P.read_msg(conn)  # HELLO
        P.write_msg(conn, P.MSG_OPENED, P.pack_opened(0, 12, 16))
        # close immediately: the client still has audio queued + no CLOSE ack

    port, t = _fake_server(behavior)
    x = np.zeros(1 << 16, np.float32)
    proc = run_native_client("127.0.0.1", port, "resynth", 600,
                             x.tobytes(), timeout=60)
    t.join(timeout=10)
    assert proc.returncode == 3
    # clean FIN -> truncation message; an RST from writing into the closed
    # socket surfaces as a connection error instead — both are failures
    assert (b"before the stream finished" in proc.stderr
            or b"connection error" in proc.stderr)


def test_stalled_server_times_out():
    """BVSP_TIMEOUT bounds a wedged server: no activity -> exit 3."""
    import os
    import subprocess

    def behavior(conn):
        import time

        P.read_msg(conn)  # HELLO
        P.write_msg(conn, P.MSG_OPENED, P.pack_opened(0, 12, 16))
        time.sleep(8)  # stall well past the client timeout

    port, t = _fake_server(behavior)
    env = dict(os.environ, BVSP_TIMEOUT="1")
    proc = subprocess.run(
        [client_binary(), "127.0.0.1", str(port), "resynth", "600"],
        input=b"", capture_output=True, timeout=60, env=env,
    )
    assert proc.returncode == 3
    assert b"no server activity" in proc.stderr


def test_server_error_surfaces_as_exit_2(codec, daemon):
    proc = run_native_client("127.0.0.1", daemon.port, "resynth", -5.0,
                             b"", timeout=60)
    assert proc.returncode == 2
    assert b"server error" in proc.stderr


def test_malformed_local_input_rejected(codec, daemon):
    # trailing partial sample in audio mode -> exit 4, no hang
    proc = run_native_client("127.0.0.1", daemon.port, "resynth", BITRATE,
                             b"\x00\x01\x02", timeout=60)
    assert proc.returncode == 4
    # garbage frame type in decode mode -> exit 4
    proc = run_native_client("127.0.0.1", daemon.port, "decode", None,
                             b"\x7f\x00\x00\x00\x00", timeout=60)
    assert proc.returncode == 4


def test_entropy_encode_decode_pipeline(codec, daemon, rng):
    """encode-ent -> .bvspf of CODES_ENT_OUT frames -> decode-ent replays
    them (both stream coders start from the same initial state): decoded
    audio equals the raw-path decode of the same codes, and the Python
    client decodes the identical code frames from the same session type."""
    x = (rng.standard_normal(768 + 256 * 9) * 0.3).astype(np.float32)

    # Python entropy client: the code-frame oracle
    with CodecClient("127.0.0.1", daemon.port, mode="encode",
                     bitrate=BITRATE, timeout=300, entropy=True,
                     entropy_block=4) as c:
        c.send_audio(x)
        c.close_input()
        ref = c.drain()

    proc = run_native_client("127.0.0.1", daemon.port, "encode-ent", BITRATE,
                             x.astype("<f4").tobytes(), timeout=300)
    assert proc.returncode == 0, proc.stderr.decode()
    frames = _parse_bvspf(proc.stdout)
    assert frames and all(t == P.MSG_CODES_ENT_OUT for t, _ in frames)

    # the native .bvspf decodes (via a mirrored coder) to the same codes
    from bvsc_tpu.serve.entropy_wire import AdaptiveCodesCoder

    mirror = AdaptiveCodesCoder(codec.conf.z_dim)
    codes = []
    for _, payload in frames:
        n, bits, body = P.unpack_codes_ent_msg(payload)
        codes.append(mirror.decode_block(body, n, bits))
    np.testing.assert_array_equal(np.concatenate(codes), ref["codes"])

    # replay the recorded entropy frames through a native decode-ent
    # session; audio must equal the raw-path decode of the same codes
    wav_raw = None
    with CodecClient("127.0.0.1", daemon.port, mode="decode", bitrate=None,
                     timeout=300) as c:
        c.send_codes(ref["codes"], bits=ref["bits"][0])
        c.close_input()
        wav_raw = c.drain()["audio"]
    # replay = retype the recorded server frames as client CODES_ENT (the
    # same 0x82 CODES_OUT -> 0x03 CODES retype the raw pipeline needs)
    blob = b"".join(struct.pack("<BI", P.MSG_CODES_ENT, len(p)) + p
                    for _, p in frames)
    proc = run_native_client("127.0.0.1", daemon.port, "decode-ent", None,
                             blob, timeout=300)
    assert proc.returncode == 0, proc.stderr.decode()
    np.testing.assert_array_equal(np.frombuffer(proc.stdout, "<f4"), wav_raw)


def test_entropy_frames_rejected_in_plain_decode(codec, daemon):
    """A plain (non-negotiated) native decode session must refuse to forward
    CODES_ENT frames from local input (exit 4 = malformed local input)."""
    payload = P.pack_codes_ent_msg(b"\0\0\0\0", 1, 4)
    blob = struct.pack("<BI", P.MSG_CODES_ENT, len(payload)) + payload
    proc = run_native_client("127.0.0.1", daemon.port, "decode", None,
                             blob, timeout=300)
    assert proc.returncode == 4, (proc.returncode, proc.stderr.decode())
