"""AOT serving-bundle tests: exported StableHLO programs == live model.

The bundle (``bvsc_tpu/serve/export.py``) is the deployment artifact the
reference has no analogue of (its deployment story is "run the Python model
code on the torch checkpoints", ``bvrnn_codec_model.py:38-42``).  These
tests prove the round trip: export -> zip -> reload in a codec-code-free
loader -> outputs match the live ``BVRNNCodecModel`` / ``FusedPacketCodec``.
"""

import numpy as np
import pytest

from bvsc_tpu.codec import BVRNNCodecModel
from bvsc_tpu.serve.export import ServingBundle, export_serving_bundle
from bvsc_tpu.streaming import FusedPacketCodec
from test_codec import small_conf


@pytest.fixture(scope="module")
def codec():
    return BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16)


@pytest.fixture(scope="module")
def bundle(codec, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bundle") / "demo.bvscx")
    manifest = export_serving_bundle(
        codec, path, batch=1, lengths=(4096,), packet=True,
        platforms=("cpu", "tpu"),  # one artifact, both backends
    )
    assert manifest["buckets"][0]["length"] == 4096
    return ServingBundle.load(path)


@pytest.mark.slow
def test_exported_encode_matches_live(codec, bundle, rng):
    x = (rng.standard_normal((1, 3000)) * 0.3).astype(np.float32)
    live = np.asarray(codec.encode(x, 3000))
    got = np.asarray(bundle.encode(x, 3000))
    np.testing.assert_array_equal(got, live)


@pytest.mark.slow
def test_exported_decode_matches_live(codec, bundle, rng):
    x = (rng.standard_normal((1, 3000)) * 0.3).astype(np.float32)
    codes = np.asarray(codec.encode(x, 3000))
    live = np.asarray(codec.decode(codes, 3000))
    got = np.asarray(bundle.decode(codes, 3000))
    np.testing.assert_allclose(got, live, atol=1e-6)


@pytest.mark.slow
def test_exported_forward_matches_live(codec, bundle, rng):
    x = (rng.standard_normal((1, 3000)) * 0.3).astype(np.float32)
    live = np.asarray(codec(x, 3000))
    got = np.asarray(bundle.forward(x, 3000))
    np.testing.assert_allclose(got, live, atol=1e-6)
    # 1-D convenience form, like the live model
    got1d = np.asarray(bundle(x[0], 3000))
    np.testing.assert_allclose(got1d, live[0], atol=1e-6)


@pytest.mark.slow
def test_exported_vbr_schedule(codec, bundle, rng):
    """Per-frame bitrate schedules survive the export boundary."""
    x = (rng.standard_normal((1, 2048)) * 0.3).astype(np.float32)
    n = 2048 // codec.conf.hopsize
    sched = np.where(np.arange(n) < n // 2, 1378.0, 5512.0).astype(np.float32)
    live = np.asarray(codec.encode(x, sched))
    got = np.asarray(bundle.encode(x, sched))
    np.testing.assert_array_equal(got, live)


@pytest.mark.slow
def test_exported_packet_codec_matches_live(codec, bundle, rng):
    """The exported packet step streams sample-for-sample with the live
    FusedPacketCodec (hence, transitively, with the one-shot codec)."""
    L = 256 * 12
    x = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)

    live = FusedPacketCodec(codec, batch=1, bitrate=3000)
    exp = bundle.packet_codec(bitrate=3000)
    out_live, out_exp = [], []
    for i in range(0, L, 777):
        out_live.append(live.process(x[:, i : i + 777]))
        out_exp.append(exp.process(x[:, i : i + 777]))
    out_live.append(live.flush())
    out_exp.append(exp.flush())
    a = np.concatenate(out_exp, axis=1)
    b = np.concatenate(out_live, axis=1)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_bundle_manifest_and_errors(codec, tmp_path, rng):
    path = str(tmp_path / "tiny.bvscx")
    export_serving_bundle(codec, path, batch=1, lengths=(2048,), packet=False,
                          platforms=("cpu",))
    b = ServingBundle.load(path)
    assert b.meta["format"] == "bvsc-serve-1"
    assert b.conf.z_dim == codec.conf.z_dim
    # no bucket covers a longer input
    with pytest.raises(ValueError, match="bucket"):
        b.encode(np.zeros((1, 60000), np.float32), 3000)
    # packet programs were not exported
    with pytest.raises(ValueError, match="packet"):
        b.packet_codec()
    # wrong batch
    with pytest.raises(ValueError, match="batch"):
        b.encode(np.zeros((2, 1024), np.float32), 3000)


@pytest.mark.slow
def test_exported_quantized_codec(tmp_path, rng):
    """int8 weight-only codecs export/reload too (mixed-dtype param npz)."""
    q = BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16,
                        quantize="int8")
    path = str(tmp_path / "q.bvscx")
    export_serving_bundle(q, path, batch=1, lengths=(2048,), packet=False,
                          platforms=("cpu",))
    b = ServingBundle.load(path)
    x = (rng.standard_normal((1, 2048)) * 0.3).astype(np.float32)
    live = np.asarray(q.encode(x, 3000))
    np.testing.assert_array_equal(np.asarray(b.encode(x, 3000)), live)


@pytest.mark.slow
def test_exported_fixed_bitrate_codec(tmp_path, rng):
    """The fixed-bit family (var_bit=false) exports/reloads: codes carry
    all z_dim bits regardless of the requested rate, equal to live."""
    import dataclasses

    conf = dataclasses.replace(small_conf(), var_bit=False)
    f = BVRNNCodecModel(config=conf, seed=3, length_bucket=16)
    path = str(tmp_path / "f64.bvscx")
    export_serving_bundle(f, path, batch=1, lengths=(2048,), packet=False,
                          platforms=("cpu",))
    b = ServingBundle.load(path)
    assert b.conf.var_bit is False
    x = (rng.standard_normal((1, 2048)) * 0.3).astype(np.float32)
    full_bps = conf.z_dim * conf.fs / conf.hopsize
    live = np.asarray(f.encode(x, full_bps))
    got = np.asarray(b.encode(x, full_bps))
    np.testing.assert_array_equal(got, live)
    # the model ignores the requested rate: no midpoints in the codes
    assert not np.any(got == 0.5)


@pytest.mark.slow
def test_symbolic_batch_export(codec, tmp_path, rng):
    """batch=None exports shape-polymorphic programs: one artifact, any
    request batch size, outputs equal the live model per batch."""
    path = str(tmp_path / "poly.bvscx")
    export_serving_bundle(codec, path, batch=None, lengths=(2048,),
                          packet=True, platforms=("cpu",))
    b = ServingBundle.load(path)
    assert b.batch is None
    for B in (1, 3):
        x = (rng.standard_normal((B, 1800)) * 0.3).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(b.encode(x, 3000)), np.asarray(codec.encode(x, 3000))
        )
        np.testing.assert_allclose(
            np.asarray(b.forward(x, 3000)), np.asarray(codec(x, 3000)),
            atol=1e-6,
        )
    # packet programs fall back to a concrete batch of 1
    assert b.meta["packet"]["batch"] == 1
    assert b.packet_codec(3000).batch == 1


def test_bundle_rejects_malformed_files(tmp_path):
    """Garbage inputs raise a clean ValueError, never a crash (same
    contract as the .bvsc reader fuzzing)."""
    p = tmp_path / "junk.bvscx"
    for payload in (b"", b"garbage not a zip", b"PK\x03\x04truncated"):
        p.write_bytes(payload)
        with pytest.raises(ValueError, match="bvscx|format"):
            ServingBundle.load(str(p))
    # a real zip missing meta.json
    import zipfile
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("other.txt", "hi")
    with pytest.raises(ValueError, match="bvscx"):
        ServingBundle.load(str(p))
    # meta.json is not JSON
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("meta.json", "{not json")
    with pytest.raises(ValueError, match="bvscx"):
        ServingBundle.load(str(p))


@pytest.mark.slow
def test_exported_vocode_matches_live(codec, tmp_path, rng):
    """The standalone vocoder program (synthesize.py semantics) matches a
    direct generator_apply on the same mel."""
    import jax.numpy as jnp

    from bvsc_tpu.models import vocoder as jvoc

    path = str(tmp_path / "v.bvscx")
    export_serving_bundle(codec, path, batch=1, lengths=(4096,),
                          packet=False, platforms=("cpu",))
    b = ServingBundle.load(path)
    vcfg = codec.conf.vocoder_config
    T = 9  # shorter than the bucket: right-padding must not leak back
    mel = rng.standard_normal((1, vcfg.num_mels, T)).astype(np.float32)
    live = np.asarray(jvoc.generator_apply(
        codec.vocoder_params, vcfg, jnp.asarray(mel), T * vcfg.total_upsample,
        precision=codec.bvrnn_cfg.precision))[:, 0, :]
    got = np.asarray(b.vocode(mel))
    assert got.shape == live.shape
    np.testing.assert_allclose(got, live, atol=1e-6)


@pytest.mark.slow
def test_exported_packet_decoder_matches_live(codec, bundle, rng):
    """Receiver-side exported program == live StreamingDecoder, including
    PLC frames.  Float-precision tolerance throughout: the reloaded export
    recompiles, so kernels may reassociate vs the live jit (measured ~1e-5
    at full scale, bit-identical at this size)."""
    from bvsc_tpu.streaming import StreamingDecoder

    x = (rng.standard_normal((1, 2048)) * 0.3).astype(np.float32)
    codes = np.asarray(codec.encode(x, 3000))
    n = codes.shape[1]

    live = StreamingDecoder(codec, batch=1)
    dec = bundle.packet_decoder()
    np.testing.assert_allclose(
        np.asarray(dec.feed(codes)), np.asarray(live.feed(codes)), atol=1e-6
    )

    # a lost frame concealed from the prior, then re-convergence frames.
    # Concealed output is a free-running function of h with no code forcing
    # (models.bvrnn.decode_plc docstring), so two compilations of the same
    # math (live jit vs reloaded export) agree only to float precision there.
    live2 = StreamingDecoder(codec, batch=1)
    dec2 = bundle.packet_decoder()
    half = n // 2
    np.testing.assert_allclose(dec2.feed(codes[:, :half]),
                               live2.feed(codes[:, :half]), atol=1e-6)
    np.testing.assert_allclose(dec2.conceal(1), live2.conceal(1), atol=1e-6)
    np.testing.assert_allclose(dec2.feed(codes[:, half + 1 :]),
                               live2.feed(codes[:, half + 1 :]), atol=1e-6)

    # conceal_bitrate plumbs through to the exported program
    dec3 = bundle.packet_decoder(conceal_bitrate=1378.0)
    live3 = StreamingDecoder(codec, batch=1, conceal_bitrate=1378.0)
    np.testing.assert_allclose(dec3.conceal(2), live3.conceal(2), atol=1e-6)


def test_old_bundle_without_receiver_programs(codec, tmp_path, rng):
    """Bundles exported with packet=False reject packet_decoder cleanly."""
    path = str(tmp_path / "nopacket.bvscx")
    export_serving_bundle(codec, path, batch=1, lengths=(1024,), packet=False,
                          platforms=("cpu",))
    b = ServingBundle.load(path)
    with pytest.raises(ValueError, match="packet"):
        b.packet_decoder()


# ---------------------------------------------------------------------------
# bundle-backed batched serving engines
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def engine_bundle(codec, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bundle") / "engine.bvscx")
    manifest = export_serving_bundle(
        codec, path, batch=1, lengths=(1024,), packet=False, engine_batch=4,
        platforms=("cpu", "tpu"),
    )
    assert manifest["engine"]["batch"] == 4
    return ServingBundle.load(path)


@pytest.mark.slow
def test_bundle_serving_engine_matches_live(codec, engine_bundle, rng):
    """N concurrent full-duplex streams from the artifact alone == the live
    ServingEngine (codes bit-exact; audio to reload float precision)."""
    from bvsc_tpu.serve.engine import ServingEngine

    L = 768 + 256 * 5
    x1 = (rng.standard_normal(L) * 0.3).astype(np.float32)
    x2 = (rng.standard_normal(L) * 0.2).astype(np.float32)

    def run(eng):
        s1 = eng.open_stream(3000)
        s2 = eng.open_stream(600)  # per-stream bitrate (VBR midpoints)
        eng.push(s1, x1)
        eng.push(s2, x2)
        c1, w1, c2, w2 = [], [], [], []
        while True:
            out = eng.tick()
            if not out:
                break
            c1.append(out[s1][0]); w1.append(out[s1][1])
            c2.append(out[s2][0]); w2.append(out[s2][1])
        return (np.stack(c1), np.concatenate(w1),
                np.stack(c2), np.concatenate(w2))

    live = run(ServingEngine(codec, max_streams=4))
    got = run(engine_bundle.serving_engine())
    np.testing.assert_array_equal(got[0], live[0])
    np.testing.assert_array_equal(got[2], live[2])
    np.testing.assert_allclose(got[1], live[1], atol=1e-6)
    np.testing.assert_allclose(got[3], live[3], atol=1e-6)


@pytest.mark.slow
def test_bundle_decode_engine_matches_live(codec, engine_bundle, rng):
    from bvsc_tpu.serve.engine import DecodeEngine

    z = codec.conf.z_dim
    frames = rng.integers(0, 2, (6, z)).astype(np.float32)
    lost = np.array([0, 0, 1, 0, 1, 0], np.float32)

    def run(eng):
        sid = eng.open_stream(conceal_bitrate=1378.0)
        eng.push(sid, frames, lost=lost)
        out = []
        while True:
            got = eng.tick()
            if sid not in got:
                break
            out.append(got[sid])
        return np.concatenate(out)

    live = run(DecodeEngine(codec, max_streams=4))
    got = run(engine_bundle.decode_engine())
    np.testing.assert_allclose(got, live, atol=1e-6)


@pytest.mark.slow
def test_daemon_serves_from_bundle(codec, engine_bundle, rng):
    """scripts/serve_daemon.py --bundle path: network serving with zero
    model code — wire output equals a live engine run."""
    from bvsc_tpu.serve.client import CodecClient
    from bvsc_tpu.serve.daemon import CodecDaemon
    from bvsc_tpu.serve.engine import ServingEngine

    x = (rng.standard_normal(768 + 256 * 4) * 0.3).astype(np.float32)
    eng = ServingEngine(codec, max_streams=4)
    sid = eng.open_stream(3000)
    eng.push(sid, x)
    eng.begin_flush(sid)  # the daemon flushes on CLOSE
    ws = []
    while True:
        out = eng.tick()
        if sid not in out:
            break
        ws.append(out[sid][1])
    wav_live = np.concatenate(ws)

    with CodecDaemon(engine_bundle, port=0) as d:
        assert d._eng.B == 4
        with CodecClient("127.0.0.1", d.port, mode="resynth", bitrate=3000,
                         timeout=300) as c:
            c.send_audio(x)
            c.close_input()
            out = c.drain()
    np.testing.assert_allclose(out["audio"], wav_live, atol=1e-6)


def test_engineless_bundle_rejects_engines(bundle):
    with pytest.raises(ValueError, match="engine"):
        bundle.serving_engine()
    with pytest.raises(ValueError, match="engine"):
        bundle.decode_engine()
