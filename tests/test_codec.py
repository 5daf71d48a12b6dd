"""End-to-end codec API tests: full-chain parity vs composed reference torch
modules, plus API/bucketing properties."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from bvsc_tpu.codec import SCALING, BVRNNCodecModel
from bvsc_tpu.config import CodecConfig, VocoderConfig
from bvsc_tpu.convert import bvrnn_params_from_torch, vocoder_params_from_torch
from test_vocoder import build_ref_generator, tiny_cfg
from torch_ref import import_reference_bvrnn


def small_conf() -> CodecConfig:
    return CodecConfig(
        num_mels=8,
        h_dim=32,
        z_dim=12,
        fs=22050,
        winsize=1024,
        hopsize=256,
        fmax=8000.0,
        mel_pad_left=256,
        var_bit=True,
        vocoder_config=tiny_cfg(num_mels=8, upsample_rates=(32, 8),
                                upsample_kernel_sizes=(64, 16),
                                layers_sym=(False, False),
                                layers_antialias=(False, False)),
    )


@pytest.fixture(scope="module")
def small_codec_and_refs():
    conf = small_conf()
    ref_bvrnn_mod = import_reference_bvrnn()
    torch.manual_seed(0)
    mean_std = [np.zeros(conf.num_mels), np.ones(conf.num_mels)]
    ref_bvrnn = ref_bvrnn_mod.BVRNN(
        conf.num_mels, conf.h_dim, conf.z_dim, mean_std, -1.0, True
    )
    ref_bvrnn.eval()
    ref_gen = build_ref_generator(conf.vocoder_config, seed=1)

    codec = BVRNNCodecModel(
        config=conf,
        bvrnn_params=bvrnn_params_from_torch(ref_bvrnn.state_dict()),
        vocoder_params=vocoder_params_from_torch(
            ref_gen.state_dict(), conf.vocoder_config
        ),
        length_bucket=16,
    )
    return codec, ref_bvrnn, ref_gen, conf


def reference_mel(conf, x):
    """The reference mel pipeline in torch (parity tested in test_mel),
    rebuilt inline for the small config — (B, T, M) for BVRNN consumption."""
    from bvsc_tpu.ops.mel import slaney_mel_filterbank

    y = torch.from_numpy(x * SCALING).float()
    pl = conf.mel_pad_left
    pr = conf.winsize - pl - conf.hopsize
    y = torch.nn.functional.pad(y.unsqueeze(1), (pl, pr), mode="reflect").squeeze(1)
    stft = torch.stft(
        y, conf.winsize, hop_length=conf.hopsize, win_length=conf.winsize,
        window=torch.hann_window(conf.winsize), center=False, onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(stft)
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(
        slaney_mel_filterbank(conf.fs, conf.winsize, conf.num_mels, conf.fmin, conf.fmax)
    )
    return torch.log(torch.clamp(fb @ spec, min=1e-5)).permute(0, 2, 1)


def reference_full_chain(ref_bvrnn, ref_gen, conf, x, bitrate):
    """Reference codec flow (bvrnn_codec_model.py:44-76) composed from the
    reference torch modules + our torch-parity mel (tested in test_mel)."""
    mel = reference_mel(conf, x)

    bits = np.round(bitrate * conf.hopsize / conf.fs) * torch.ones(mel.shape[:2])
    h = torch.zeros(1, mel.shape[0], conf.h_dim)
    with torch.no_grad():
        codes, _ = ref_bvrnn.encode(mel, bits, h)
        mel_hat, _ = ref_bvrnn.decode(codes, torch.zeros(1, mel.shape[0], conf.h_dim))
        wav = ref_gen(mel_hat.permute(0, 2, 1), x.shape[1]).squeeze(1) / SCALING
    return codes.numpy(), wav.numpy()


def test_full_chain_parity(small_codec_and_refs, rng):
    codec, ref_bvrnn, ref_gen, conf = small_codec_and_refs
    L = 22050  # 1 s
    x = (rng.standard_normal((2, L)) * 0.3).astype(np.float32)
    codes_ref, wav_ref = reference_full_chain(ref_bvrnn, ref_gen, conf, x, 3000)

    codes = np.asarray(codec.encode(x, 3000))
    np.testing.assert_array_equal(codes, codes_ref)

    wav = np.asarray(codec.decode(codes, L))
    assert wav.shape == wav_ref.shape == (2, L)
    # tiny f32 mel-decode differences get amplified through the deep vocoder
    # conv stack; require high SNR rather than elementwise exactness
    from bvsc_tpu.eval.metrics import snr_db

    snr = snr_db(wav_ref, wav)
    assert snr > 40.0, f"waveform SNR vs reference too low: {snr:.1f} dB"
    np.testing.assert_allclose(wav, wav_ref, atol=5e-2)


def test_call_equals_two_step(small_codec_and_refs, rng):
    """The fused one-program __call__ (encode_decode scan, no separate decode
    scan) computes the same math as the two-program composition — the
    state-sync invariant made into a whole-codec property.  The two jitted
    programs fuse differently, so waveforms agree to float precision (~1e-7
    reassociation noise), while the scan-level equivalence is asserted
    bitwise in test_bvrnn.py::test_encode_decode_fused_matches_composed.
    Lengths are chosen to exercise bucket padding (the in-scan 0.5-forced
    frames)."""
    codec, *_ = small_codec_and_refs
    for L, B in ((10000, 1), (4096 * 16, 2), (4099, 3)):
        x = (rng.standard_normal((B, L)) * 0.2).astype(np.float32)
        one = np.asarray(codec(x, 2000))
        two = np.asarray(codec(x, 2000, fused=False))
        assert one.shape == two.shape == (B, L)
        np.testing.assert_allclose(one, two, atol=2e-6)
        np.testing.assert_array_equal(
            two, np.asarray(codec.decode(codec.encode(x, 2000), L))
        )
    # 1-D promotion parity between the fused and two-step paths
    x1 = (rng.standard_normal(6000) * 0.2).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(codec(x1, 2000)), np.asarray(codec(x1, 2000, fused=False)),
        atol=2e-6,
    )


@pytest.mark.slow
def test_non_hop_multiple_lengths(small_codec_and_refs, rng):
    codec, *_ = small_codec_and_refs
    for L in (5000, 4099, 22050 + 7):
        x = (rng.standard_normal((1, L)) * 0.2).astype(np.float32)
        y = np.asarray(codec(x, 3000))
        assert y.shape == (1, L)
        assert np.isfinite(y).all()


def test_bitrate_rounding(small_codec_and_refs):
    codec, *_ = small_codec_and_refs
    # reference: round(bitrate * hop / fs) (bvrnn_codec_model.py:58-59)
    assert codec.bits_per_frame(3000) == np.round(3000 * 256 / 22050)
    assert codec.bits_per_frame(1000) == 12.0


def test_bucketing_reuses_compilation(small_codec_and_refs, rng):
    codec, *_ = small_codec_and_refs
    # two nearby lengths land in the same bucket -> same padded shapes
    assert codec._pad_length(5000) == codec._pad_length(5001)
    x1 = (rng.standard_normal((1, 5000)) * 0.1).astype(np.float32)
    x2 = (rng.standard_normal((1, 5001)) * 0.1).astype(np.float32)
    assert np.asarray(codec(x1, 3000)).shape == (1, 5000)
    assert np.asarray(codec(x2, 3000)).shape == (1, 5001)


def test_default_config_loads():
    codec = BVRNNCodecModel  # class import sanity
    conf = CodecConfig.from_toml("configs/varbitrate.toml")
    assert conf.h_dim == 1024 and conf.z_dim == 64 and conf.var_bit
    assert conf.vocoder_config.upsample_rates == (8, 8, 2, 2)
    conf64 = CodecConfig.from_toml("configs/fixed64.toml")
    assert not conf64.var_bit


def test_1d_input_promotion(small_codec_and_refs, rng):
    """A 1-D waveform (the natural single-utterance call) is auto-promoted to
    batch 1 and the batch axis squeezed from every result (ADVICE r1)."""
    codec, _, _, conf = small_codec_and_refs
    x = (rng.standard_normal(22050) * 0.3).astype(np.float32)
    codes1 = np.asarray(codec.encode(x, 3000))
    codes2 = np.asarray(codec.encode(x[None], 3000))
    assert codes1.ndim == 2
    np.testing.assert_array_equal(codes1, codes2[0])
    y1 = np.asarray(codec.decode(codes1, x.shape[0]))
    y2 = np.asarray(codec.decode(codes2, x.shape[0]))
    assert y1.shape == (x.shape[0],)
    np.testing.assert_array_equal(y1, y2[0])
    out = np.asarray(codec(x, 3000))
    assert out.shape == (x.shape[0],)
    with pytest.raises(ValueError):
        codec.encode(x[None, None], 3000)
    with pytest.raises(ValueError):
        codec.decode(codes1[None, None], 100)


def test_encode_per_frame_bitrate(small_codec_and_refs, rng):
    """VBR at the public surface: ``encode`` accepts a per-frame bps schedule
    (mid-stream rate switches).  The reference only broadcasts a scalar at its
    codec layer (``bvrnn_codec_model.py:58-59``) but its model layer is
    genuinely per-frame (``bvrnn.py:180-184``) — so the reference torch model
    driven with the varying schedule is the parity oracle."""
    codec, ref_bvrnn, _, conf = small_codec_and_refs
    L = 22050
    x = (rng.standard_normal((1, L)) * 0.3).astype(np.float32)
    n_frames = codec.frontend.num_frames(L)

    # a constant per-frame schedule bit-matches the scalar path
    const = np.full(n_frames, 3000.0, np.float32)
    np.testing.assert_array_equal(
        np.asarray(codec.encode(x, const)), np.asarray(codec.encode(x, 3000))
    )

    # a genuinely varying schedule matches the reference model layer
    bps = np.where(np.arange(n_frames) < n_frames // 2, 1500.0, 6000.0)
    codes = np.asarray(codec.encode(x, bps))[0]
    mel = reference_mel(conf, x)
    bits_t = torch.from_numpy(
        np.round(bps * conf.hopsize / conf.fs).astype(np.float32)
    )[None, :]
    with torch.no_grad():
        codes_ref, _ = ref_bvrnn.encode(
            mel, bits_t, torch.zeros(1, 1, conf.h_dim)
        )
    np.testing.assert_array_equal(codes, codes_ref.numpy()[0])
    # masked positions honor the per-frame allocation
    ks = np.round(bps * conf.hopsize / conf.fs).astype(int)
    for t in (0, n_frames // 2, n_frames - 1):
        assert (codes[t, min(ks[t], conf.z_dim):] == 0.5).all()

    # (batch, frames) schedules and shape validation
    codes_b = np.asarray(codec.encode(x, bps[None, :]))
    np.testing.assert_array_equal(codes_b[0], codes)
    with pytest.raises(ValueError, match="per-frame bitrate shape"):
        codec.encode(x, bps[:-1])


def test_checkpoint_loading_paths(tmp_path):
    """The three trainer-artifact loading paths added for real training runs:
    flat-npz demo format, targetless-Orbax TrainState restore (list
    children), and weight-norm folding of trainer vocoder params."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bvsc_tpu.codec import _load_bvrnn_checkpoint, _load_vocoder_checkpoint
    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.models import bvrnn as bvrnn_mod
    from bvsc_tpu.models import vocoder as voc_mod
    from bvsc_tpu.ops.conv import fold_weight_norm
    from bvsc_tpu.train import checkpoint as ckpt

    conf = CodecConfig(h_dim=32, z_dim=8, num_mels=16)
    bcfg = bvrnn_mod.BVRNNConfig(x_dim=16, h_dim=32, z_dim=8)
    params = bvrnn_mod.init_bvrnn_params(jax.random.key(0), bcfg)

    # flat npz roundtrip
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(p.key if hasattr(p, "key") else str(p.idx) for p in path)
        flat[key] = np.asarray(leaf)
    npz = tmp_path / "demo.npz"
    np.savez(npz, **flat)
    loaded = _load_bvrnn_checkpoint(str(npz), jnp.float32)
    assert jax.tree.structure(loaded) == jax.tree.structure(params)
    np.testing.assert_allclose(
        np.asarray(loaded["gru"]["w_ih"]), np.asarray(params["gru"]["w_ih"])
    )

    # targetless Orbax restore of a TrainState-shaped list
    state_like = [params, [np.zeros(3)], np.asarray(7)]
    ckpt.save_pytree(str(tmp_path / "bvrnn_00000007"), state_like)
    loaded2 = _load_bvrnn_checkpoint(str(tmp_path / "bvrnn_00000007"), jnp.float32)
    assert isinstance(loaded2, dict) and "gru" in loaded2 and "phi_x" in loaded2

    # weight-normed vocoder trainer params fold on load
    vcfg = conf.vocoder_config
    wn = voc_mod.init_generator_params(jax.random.key(1), vcfg, weight_norm=True)
    ckpt.save_pytree(str(tmp_path / "g_00000001"), {"generator": wn})
    voc_loaded = _load_vocoder_checkpoint(str(tmp_path / "g_00000001"), vcfg, jnp.float32)
    assert "w" in voc_loaded["conv_pre"] and "g" not in voc_loaded["conv_pre"]
    np.testing.assert_allclose(
        np.asarray(voc_loaded["conv_pre"]["w"]),
        np.asarray(fold_weight_norm(wn["conv_pre"]["g"], wn["conv_pre"]["v"])),
        rtol=1e-6,
    )


def test_fast_serving_path_close_to_parity(small_codec_and_refs):
    """precision='default' (bf16 MXU + approx snake + bf16 vocoder segment)
    stays within the documented fast-path output contract of the parity
    path on the same codes, and still emits f32 waveform."""
    codec, _, _, conf = small_codec_and_refs
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((1, 4096)) * 0.3).astype(np.float32)
    fast = BVRNNCodecModel(
        config=conf,
        bvrnn_params=codec.bvrnn_params,
        vocoder_params=codec.vocoder_params,
        length_bucket=16,
        precision="default",
    )
    assert fast.approx_snake and fast.voc_dtype == "bf16"
    codes = codec.encode(x, 3000)
    y_par = np.asarray(codec.decode(codes, x.shape[1]))
    y_fast = np.asarray(fast.decode(codes, x.shape[1]))
    assert y_fast.dtype == np.float32
    assert y_fast.shape == y_par.shape
    # tanh-bounded waveform; bf16 contract is ~1e-3 typical
    assert np.abs(y_par - y_fast).max() < 2e-2


def test_voc_batch_bucketing_matches_per_stream(rng):
    """The mid-batch vocoder padding policy (codec.VOC_BATCH_PAD_LO <= B <
    PAD_TO pads the generator batch; an XLA small-batch conv-lowering
    pathology costs 2-3x otherwise — benchmarks/probe_b64_cliff.py) must
    not change decoded audio: batched rows equal per-stream decodes."""
    from bvsc_tpu.codec import VOC_BATCH_PAD_LO

    conf = small_conf()
    codec = BVRNNCodecModel(config=conf, seed=3, length_bucket=16)
    B = VOC_BATCH_PAD_LO  # inside the padding window
    L = 256 * 18
    x = (rng.standard_normal((B, L)) * 0.3).astype(np.float32)
    codes = np.asarray(codec.encode(x, 3000))
    wav_b = np.asarray(codec.decode(codes, L))
    for i in (0, B - 1):
        wav_1 = np.asarray(codec.decode(codes[i : i + 1], L))
        np.testing.assert_allclose(wav_b[i : i + 1], wav_1, atol=2e-5,
                                   err_msg=f"row {i}")
