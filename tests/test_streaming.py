"""Streaming == one-shot exactness tests (the deployability property)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bvsc_tpu.codec import BVRNNCodecModel, SCALING
from bvsc_tpu.models import vocoder as jvoc
from bvsc_tpu.streaming import (
    StreamingCodec,
    StreamingDecoder,
    StreamingEncoder,
    generator_stream_init,
    generator_stream_step,
)
from test_codec import small_conf


@pytest.fixture(scope="module")
def codec():
    return BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16)


@pytest.mark.slow
def test_streaming_vocoder_equals_oneshot():
    cfg = small_conf().vocoder_config
    params = jvoc.init_generator_params(jax.random.key(0), cfg, weight_norm=False)
    rng = np.random.default_rng(0)
    T = 24
    up = cfg.total_upsample
    mel = rng.standard_normal((2, cfg.num_mels, T)).astype(np.float32)
    ref = np.asarray(jvoc.generator_apply(params, cfg, jnp.asarray(mel), T * up))

    for chunks in ([24], [1] * 24, [3, 5, 7, 9], [10, 14]):
        state = generator_stream_init(cfg, batch=2)
        outs = []
        t0 = 0
        for n in chunks:
            state, y = generator_stream_step(
                params, cfg, state, jnp.asarray(mel[:, :, t0 : t0 + n])
            )
            outs.append(np.asarray(y))
            t0 += n
        got = np.concatenate(outs, axis=-1)
        assert got.shape == (2, 1, T * up)
        np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=str(chunks))


def test_streaming_vocoder_rejects_noncausal():
    cfg = small_conf().vocoder_config
    sym = cfg.__class__(**{**cfg.__dict__, "layers_sym": (True, True)})
    with pytest.raises(ValueError):
        generator_stream_init(sym, 1)


@pytest.mark.slow
def test_streaming_encoder_equals_oneshot(codec, rng):
    L = 256 * 40
    x = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)
    ref_codes = np.asarray(codec.encode(x, 3000))

    for chunk in (256, 768, 1000, 4096):
        enc = StreamingEncoder(codec, batch=1, bitrate=3000)
        outs = []
        for i in range(0, L, chunk):
            outs.append(enc.feed(x[:, i : i + chunk]))
        outs.append(enc.flush())
        codes = np.concatenate(outs, axis=1)
        assert codes.shape == ref_codes.shape, (chunk, codes.shape, ref_codes.shape)
        np.testing.assert_array_equal(codes, ref_codes, err_msg=f"chunk={chunk}")


def test_streaming_first_frame_latency(codec, rng):
    """First code frame appears once 768 samples (= 34.8 ms) arrived."""
    x = (rng.standard_normal((1, 2048)) * 0.3).astype(np.float32)
    enc = StreamingEncoder(codec, batch=1, bitrate=3000)
    assert enc.feed(x[:, :767]).shape[1] == 0
    assert enc.feed(x[:, 767:768]).shape[1] == 1


@pytest.mark.slow
def test_streaming_full_codec_equals_oneshot(codec, rng):
    L = 256 * 30
    x = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)
    ref_wav = np.asarray(codec(x, 3000))

    sc = StreamingCodec(codec, batch=1, bitrate=3000)
    outs = []
    for i in range(0, L, 1024):
        outs.append(sc.process(x[:, i : i + 1024]))
    outs.append(sc.flush())
    wav = np.concatenate(outs, axis=1)
    # streaming emits one wav chunk per code frame; one-shot trims to L
    assert wav.shape[1] >= ref_wav.shape[1]
    np.testing.assert_allclose(wav[:, : ref_wav.shape[1]], ref_wav, atol=1e-5)


def test_streaming_decoder_state_carry(codec, rng):
    """Feeding codes frame-by-frame equals feeding all at once."""
    codes = rng.integers(0, 2, size=(1, 12, codec.conf.z_dim)).astype(np.float32)
    d1 = StreamingDecoder(codec, batch=1)
    all_at_once = d1.feed(codes)
    d2 = StreamingDecoder(codec, batch=1)
    parts = [d2.feed(codes[:, i : i + 1]) for i in range(12)]
    np.testing.assert_allclose(
        np.concatenate(parts, axis=1), all_at_once, atol=1e-5
    )


def test_fused_packet_codec_equals_oneshot(codec, rng):
    from bvsc_tpu.streaming import FusedPacketCodec

    for L in (256 * 30, 256 * 20 + 100):
        x = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)
        ref_wav = np.asarray(codec(x, 3000))
        fc = FusedPacketCodec(codec, batch=1, bitrate=3000)
        outs = [fc.process(x[:, i : i + 256]) for i in range(0, L - 255, 256)]
        if L % 256:
            outs.append(fc.process(x[:, L - L % 256 :]))
        outs.append(fc.flush())
        wav = np.concatenate(outs, axis=1)
        n = min(wav.shape[1], ref_wav.shape[1])
        assert abs(wav.shape[1] - ref_wav.shape[1]) < 256, (wav.shape, ref_wav.shape)
        np.testing.assert_allclose(wav[:, :n], ref_wav[:, :n], atol=1e-5,
                                   err_msg=f"L={L}")


# ---------------------------------------------------------------------------
# Fast serving mode (precision='default') on the streaming paths — the knobs
# (approx_snake / voc_dtype / bf16 MXU) must reach the streaming programs so
# a fast codec is numerically consistent streaming vs offline (advisor r3).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fast_codec():
    return BVRNNCodecModel(config=small_conf(), seed=3, length_bucket=16,
                           precision="default")


def _jaxpr_prims(closed):
    names: set = set()

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            names.add(eqn.primitive.name)
            for v in eqn.params.values():
                for item in (v if isinstance(v, (list, tuple)) else (v,)):
                    sub = getattr(item, "jaxpr", item)
                    if hasattr(sub, "eqns"):
                        walk(sub)

    walk(closed.jaxpr)
    return names


def test_stream_step_fast_knobs_reach_graph(fast_codec):
    """approx_snake swaps sin for the polynomial; compute_dtype casts the
    whole streaming generator to bf16."""
    from bvsc_tpu.streaming import voc_compute_dtype, voc_state_dtype

    cfg = fast_codec.conf.vocoder_config
    assert voc_compute_dtype(fast_codec) == jnp.bfloat16
    state = generator_stream_init(cfg, batch=1, dtype=voc_state_dtype(fast_codec))
    mel = jnp.zeros((1, cfg.num_mels, 2), jnp.float32)

    closed = jax.make_jaxpr(
        lambda p, s, m: generator_stream_step(
            p, cfg, s, m, precision=fast_codec.bvrnn_cfg.precision,
            approx_snake=True, compute_dtype=jnp.bfloat16)
    )(fast_codec.vocoder_params, state, mel)
    prims = _jaxpr_prims(closed)
    assert "sin" not in prims and "round" in prims
    new_state, wav = generator_stream_step(
        fast_codec.vocoder_params, cfg, state, mel,
        approx_snake=True, compute_dtype=jnp.bfloat16)
    assert wav.dtype == jnp.bfloat16
    assert all(a.dtype == jnp.bfloat16 for a in jax.tree.leaves(new_state))


def test_fast_streaming_consistent_with_offline(fast_codec, rng):
    """FusedPacketCodec and StreamingDecoder under precision='default' run
    the SAME serving numerics as the offline fast decode (not the exact-f32
    path): codes agree and waveforms match within the fast-mode contract."""
    from bvsc_tpu.streaming import FusedPacketCodec

    L = 256 * 24
    x = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)
    codes = np.asarray(fast_codec.encode(x, 3000))
    ref_wav = np.asarray(fast_codec.decode(codes, L))

    # receiver path: StreamingDecoder with the fast codec
    dec = StreamingDecoder(fast_codec, batch=1)
    wav_stream = dec.feed(codes)
    n = min(wav_stream.shape[1], ref_wav.shape[1])
    assert wav_stream.dtype == np.float32
    np.testing.assert_allclose(wav_stream[:, :n], ref_wav[:, :n], atol=7e-2)

    # full-duplex packet path
    fc = FusedPacketCodec(fast_codec, batch=1, bitrate=3000)
    outs = [fc.process(x[:, i : i + 256]) for i in range(0, L, 256)]
    outs.append(fc.flush())
    wav_pkt = np.concatenate(outs, axis=1)
    n = min(wav_pkt.shape[1], ref_wav.shape[1])
    np.testing.assert_allclose(wav_pkt[:, :n], ref_wav[:, :n], atol=7e-2)


def test_bench_packet_chain_default_codec(fast_codec, rng):
    """Regression for VERDICT r4 #1: bench.py's packet-chain latency probe
    must thread approx_snake/voc_dtype exactly like FusedPacketCodec._step.
    With a precision='default' codec the initial vocoder state is bf16, so
    a step that computes f32 dtype-mismatches the scan carry — the trace
    error that silently dropped stream_device_ms_* from BENCH_r04.json.
    The chain construction is shared with bench via bench.build_packet_chain
    and reproduces off-TPU."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from bvsc_tpu.streaming import FusedPacketCodec

    fc = FusedPacketCodec(fast_codec, batch=1, bitrate=3000)
    x_host = (rng.standard_normal((1, 256 * 12)) * 0.3).astype(np.float32)
    fc.process(x_host[:1, : fc.winsize - fc.pad_left])
    chain, args = bench.build_packet_chain(fast_codec, fc, 4, x_host)
    acc = chain(*args)  # traces + runs; the r4 bug raised TypeError here
    assert np.isfinite(float(acc))


def test_use_pallas_rejects_fast_knobs():
    with pytest.raises(ValueError, match="approx_snake"):
        BVRNNCodecModel(config=small_conf(), precision="default",
                        use_pallas=True, approx_snake=True)
    with pytest.raises(ValueError, match="voc_dtype"):
        BVRNNCodecModel(config=small_conf(), precision="default",
                        use_pallas=True, voc_dtype="bf16")
