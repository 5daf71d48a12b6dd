"""Wire-format v2: prior-adaptive rANS entropy coding.

Covers the native/python coder (byte-identical streams, roundtrip,
truncation/corruption detection), the PriorEntropyCoder contract
(bit-exact roundtrip incl. VBR and zero-bit frames, quantised-params
rejection), and the .bvsc v2 container.  The reference has no analogue —
it transmits the first-k bits raw although its Bernoulli-KL trains a prior
P(z_t | h_t) (reference ``bvrnn.py:148-156``) that is exactly an entropy
model for them.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvsc_tpu.models import bvrnn as bvrnn_mod
from bvsc_tpu.entropy import PriorEntropyCoder
from bvsc_tpu.ops import rans

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
))


@pytest.fixture(scope="module")
def small():
    cfg = bvrnn_mod.BVRNNConfig(x_dim=12, h_dim=48, z_dim=20)
    params = bvrnn_mod.init_bvrnn_params(jax.random.key(3), cfg)
    rng = np.random.default_rng(7)
    frames = 33
    y = jnp.asarray(rng.standard_normal((1, frames, cfg.x_dim)), jnp.float32)
    ks = rng.integers(0, cfg.z_dim + 1, frames)
    z, _ = bvrnn_mod.encode(
        params, cfg, y, jnp.asarray(ks, jnp.float32)[None],
        jnp.zeros((1, cfg.h_dim)),
    )
    return cfg, params, np.asarray(z[0]), ks


def _expected(z, ks, z_dim):
    out = np.full_like(z, 0.5)
    for t, k in enumerate(ks):
        out[t, :k] = (z[t, :k] > 0.5 + 1e-6).astype(np.float32)
    return out


def test_rans_native_python_identical_and_roundtrip():
    rng = np.random.default_rng(0)
    n = 4096
    p = rng.uniform(0.001, 0.999, n)
    q = rans.quantize_probs(p)
    bits = (rng.uniform(size=n) < p).astype(np.uint8)

    payload = rans.rans_encode(bits, q)
    dec = rans.RansDecoder(payload)
    got = np.concatenate(
        [dec.decode_bits(q[i : i + 37]) for i in range(0, n, 37)]
    )
    dec.finish()
    np.testing.assert_array_equal(got, bits)

    # the pure-Python mirror must emit byte-identical streams
    saved = (rans._lib, rans._tried)
    try:
        rans._lib, rans._tried = None, True
        assert rans.rans_encode(bits, q) == payload
        d2 = rans.RansDecoder(payload)
        np.testing.assert_array_equal(d2.decode_bits(q), bits)
        d2.finish()
    finally:
        rans._lib, rans._tried = saved

    # coded size is near the model cross-entropy (within 1% + flush bytes)
    h_bytes = -(
        bits * np.log2(q / 65536.0) + (1 - bits) * np.log2(1 - q / 65536.0)
    ).sum() / 8
    assert len(payload) <= h_bytes * 1.01 + 8


def test_rans_truncation_and_corruption_detected():
    rng = np.random.default_rng(1)
    q = rans.quantize_probs(rng.uniform(0.2, 0.8, 256))
    bits = rng.integers(0, 2, 256).astype(np.uint8)
    payload = rans.rans_encode(bits, q)

    with pytest.raises(ValueError):
        dec = rans.RansDecoder(payload[: len(payload) // 2])
        dec.decode_bits(q)
        dec.finish()

    bad = bytearray(payload)
    bad[len(bad) // 2] ^= 0x5A
    with pytest.raises(ValueError):
        dec = rans.RansDecoder(bytes(bad))
        dec.decode_bits(q)
        dec.finish()


def test_prior_coder_roundtrip_vbr(small):
    cfg, params, z, ks = small
    ec = PriorEntropyCoder(params, cfg)
    payload = ec.encode(z, ks)
    got = ec.decode(payload, ks, z.shape[0])
    np.testing.assert_array_equal(got, _expected(z, ks, cfg.z_dim))
    # decoded codes are the exact input decode() expects: re-encoding the
    # same codes is deterministic
    assert ec.encode(got, ks) == payload


def test_prior_coder_constant_bitrate(small):
    cfg, params, z, _ = small
    ec = PriorEntropyCoder(params, cfg)
    k = 9
    payload = ec.encode(z, k)
    got = ec.decode(payload, k, z.shape[0])
    np.testing.assert_array_equal(
        got, _expected(z, np.full(z.shape[0], k), cfg.z_dim)
    )
    m = ec.measure(z, k)
    assert m["raw_bytes"] == (z.shape[0] * k + 7) // 8
    assert m["coded_bytes"] == len(payload)


def test_prior_coder_rejects_quantized_params(small):
    """Must reject the REAL quantized structure (w = {'q': int8, 'scale':
    f32}, float biases) — a first-leaf dtype check passes it silently
    because tree_leaves order puts the float bias first."""
    cfg, params, _, _ = small
    from bvsc_tpu.ops.quant import quantize_bvrnn_params

    with pytest.raises(ValueError, match="float"):
        PriorEntropyCoder(quantize_bvrnn_params(params), cfg)
    # the crude all-leaves-int8 structure is rejected too
    qparams = jax.tree.map(
        lambda a: (np.asarray(a) * 64).astype(np.int8), params
    )
    with pytest.raises(ValueError, match="float"):
        PriorEntropyCoder(qparams, cfg)


def test_fractional_bits_transmit_ceil(small):
    """The model's bit mask transmits every index strictly below the
    allocation, so fractional bits/frame must CEIL at the wire layers
    (truncation would drop the top bit and desync the closed loop)."""
    from bvsc_tpu.models import bvrnn as bvrnn_mod
    from bvsc_tpu.ops.bitpack import pack_codes, payload_nbytes, unpack_codes

    cfg, params, _, _ = small
    rng = np.random.default_rng(3)
    frames = 9
    y = jnp.asarray(rng.standard_normal((1, frames, cfg.x_dim)), jnp.float32)
    ks = np.full(frames, 4.5, np.float32)  # mask transmits 5 bits
    z, _ = bvrnn_mod.encode(
        params, cfg, y, jnp.asarray(ks)[None], jnp.zeros((1, cfg.h_dim))
    )
    z = np.asarray(z[0])
    assert (z[:, 5:] == 0.5).all() and not (z[:, 4] == 0.5).all()

    payload = pack_codes(z, ks)
    assert len(payload) == payload_nbytes(ks, frames, cfg.z_dim) \
        == (frames * 5 + 7) // 8
    got = unpack_codes(payload, ks, frames, cfg.z_dim)
    np.testing.assert_array_equal(got, _expected(z, np.full(frames, 5), cfg.z_dim))

    ec = PriorEntropyCoder(params, cfg)
    got2 = ec.decode(ec.encode(z, ks), ks, frames)
    np.testing.assert_array_equal(got2, got)


def test_bvsc_v2_container_roundtrip(tmp_path, small):
    import codec_cli

    cfg, params, z, _ = small
    ec = PriorEntropyCoder(params, cfg)
    path = str(tmp_path / "x.bvsc")
    codec_cli.write_bvsc(path, z, 7, 22050, coder=ec)
    codes, bits, fs = codec_cli.read_bvsc(path, lambda: ec)
    assert (bits, fs) == (7, 22050)
    np.testing.assert_array_equal(
        codes, _expected(z, np.full(z.shape[0], 7), cfg.z_dim)
    )
    # v2 without a coder is an explicit error, not a garbage decode
    with pytest.raises(ValueError, match="prior"):
        codec_cli.read_bvsc(path)
    # v1 still round-trips through the same entry points
    codec_cli.write_bvsc(path, z, 7, 22050)
    codes1, _, _ = codec_cli.read_bvsc(path)
    np.testing.assert_array_equal(codes1, codes)


def test_bvsc_vbr_allocation_table(tmp_path, small):
    """Per-frame bit allocations (mid-stream bitrate switches) survive the
    container: a u8 table after the header, for both v1 and v2 payloads."""
    import codec_cli

    cfg, params, z, ks = small
    path = str(tmp_path / "vbr.bvsc")

    codec_cli.write_bvsc(path, z, ks, 22050)
    codes, bits, fs = codec_cli.read_bvsc(path)
    np.testing.assert_array_equal(bits, ks)
    np.testing.assert_array_equal(codes, _expected(z, ks, cfg.z_dim))

    ec = PriorEntropyCoder(params, cfg)
    codec_cli.write_bvsc(path, z, ks, 22050, coder=ec)
    codes2, bits2, _ = codec_cli.read_bvsc(path, lambda: ec)
    np.testing.assert_array_equal(bits2, ks)
    np.testing.assert_array_equal(codes2, codes)

    # truncated allocation table is rejected
    raw = open(path, "rb").read()
    trunc = str(tmp_path / "trunc.bvsc")
    with open(trunc, "wb") as f:
        f.write(raw[: 16 + len(ks) // 2])
    with pytest.raises(ValueError, match="truncated VBR"):
        codec_cli.read_bvsc(trunc, lambda: ec)


def test_bvsc_reader_rejects_garbage(tmp_path, small):
    """Fuzz the container reader: random byte blobs and random truncations/
    corruptions of a valid file must raise ValueError (never crash, hang,
    or allocate absurdly), for both payload versions."""
    import codec_cli

    cfg, params, z, ks = small
    ec = PriorEntropyCoder(params, cfg)
    v1 = str(tmp_path / "v1.bvsc")
    v2 = str(tmp_path / "v2.bvsc")
    codec_cli.write_bvsc(v1, z, 7, 22050)
    codec_cli.write_bvsc(v2, z, 7, 22050, coder=ec)
    rng = np.random.default_rng(0)
    bad = str(tmp_path / "bad.bvsc")

    def expect_reject(payload: bytes):
        with open(bad, "wb") as f:
            f.write(payload)
        try:
            codec_cli.read_bvsc(bad, lambda: ec)
        except ValueError:
            return True
        return False  # parsed — only acceptable for benign corruptions

    # pure garbage (wrong magic) always rejects
    for n in (0, 3, 16, 64):
        assert expect_reject(rng.bytes(n))
    # magic + garbage header/payload: never crashes; anything short of a
    # full 12-byte header MUST reject
    for _ in range(50):
        n = int(rng.integers(1, 40))
        ok = expect_reject(b"BVSC" + rng.bytes(n))
        if n < 12:
            assert ok, "short header accepted"
    # absurd frame counts in the header must reject BEFORE allocating
    import struct
    huge = b"BVSC" + struct.pack("<BBHII", 2, cfg.z_dim, 7, 22050, 1 << 31)
    assert expect_reject(huge + b"\x00" * 8)
    huge_vbr = b"BVSC" + struct.pack("<BBHII", 1, cfg.z_dim, 0xFFFF, 22050, 1 << 31)
    assert expect_reject(huge_vbr)
    # random truncations of valid files
    for path in (v1, v2):
        raw = open(path, "rb").read()
        for _ in range(20):
            cut = int(rng.integers(0, len(raw)))
            if cut == len(raw):
                continue
            expect_reject(raw[:cut])  # must not crash; v1 short-payload and
            # v2 rANS-unwind cases raise, header-only prefixes raise too
    # random single-byte corruptions of the v2 payload body: either the
    # rANS state-unwind check fires or the decode must differ from the
    # truth — a corruption that silently decodes to the original codes
    # would void the "corrupt payloads detected" contract
    raw = bytearray(open(v2, "rb").read())
    truth, _, _ = codec_cli.read_bvsc(v2, lambda: ec)
    for _ in range(10):
        i = int(rng.integers(16, len(raw)))
        orig = raw[i]
        raw[i] ^= 0xA5
        with open(bad, "wb") as f:
            f.write(bytes(raw))
        try:
            got, _, _ = codec_cli.read_bvsc(bad, lambda: ec)
            assert not np.array_equal(got, truth), (
                f"byte {i} corruption decoded to the original codes"
            )
        except ValueError:
            pass
        raw[i] = orig
