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
