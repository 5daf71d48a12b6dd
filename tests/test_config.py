"""The ACTUAL reference TOML files must load unchanged (SURVEY §2.16;
reference ``bvrnn_codec_model.py:27-36`` / ``configs/*.toml``)."""

import os

import pytest

from bvsc_tpu.config import CodecConfig

REF_CFG_DIR = "/root/reference/configs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CFG_DIR), reason="reference checkout not present"
)


def test_reference_varbitrate_toml_loads_unchanged():
    c = CodecConfig.from_toml(os.path.join(REF_CFG_DIR, "config_varBitRate.toml"))
    assert c.train_name == "variable_BitrateKLMask"
    assert (c.adam_b1, c.adam_b2) == (0.9, 0.999)
    assert c.batch_size == 32
    assert c.validate_only is False
    assert c.val_interval == 10000
    assert c.distinct_chkpt_interval == 10000
    assert c.max_steps == 200000
    assert c.num_workers == 8
    assert c.learning_rate == 0.0002
    assert c.lr_decay == 0.99999306855
    assert c.scheduler_max_steps == 200000
    assert c.grad_clip == 130
    assert (c.num_mels, c.fmin, c.fmax, c.mel_pad_left) == (80, 0, 8000, 256)
    assert (c.h_dim, c.z_dim) == (1024, 64)
    assert c.log_sigma_init == -1.0
    assert c.var_bit is True
    assert c.p_bitratechange == 0.3
    assert c.teacher_force_step_1perc == 30000
    assert c.resume is False
    assert (c.fs, c.winsize, c.hopsize) == (22050, 1024, 256)
    assert c.train_seq_duration == 4.0
    assert c.vocoder_checkpoint == "./pretrained_vocoder/g_checkpoint"

    v = c.vocoder_config
    assert v.resblock == "1"
    assert v.num_mels == 80
    assert v.pre_sym is False and v.post_sym is False
    assert v.upsample_rates == (8, 8, 2, 2)
    assert v.upsample_kernel_sizes == (16, 16, 4, 4)
    assert v.upsample_initial_channel == 128
    assert v.resblock_kernel_sizes == (3, 7, 11)
    assert v.resblock_dilation_sizes == ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    assert v.layers_sym == (False, False, False, False)
    assert v.layers_antialias == (False, False, False, False)
    assert v.antialias_post is False
    assert v.activation == "snakebeta"
    assert v.snake_logscale is True
    assert v.resolutions == ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))
    assert v.mpd_reshapes == (2, 3, 5, 7, 11)
    assert v.use_spectral_norm is False
    assert v.discriminator_channel_mult == 1
    assert v.total_upsample == 256 == c.hopsize

    # derived quantities the codec relies on
    assert c.bits_per_frame(3000) == 35
    assert c.bits_per_frame(5512.5) == 64


def test_reference_fixed64_toml_loads_unchanged():
    c = CodecConfig.from_toml(os.path.join(REF_CFG_DIR, "config_64bit.toml"))
    assert c.train_name == "64bit_fixed"
    assert c.var_bit is False
    # everything else identical to the varBitRate config (verified upstream diff)
    assert (c.h_dim, c.z_dim, c.fs, c.hopsize) == (1024, 64, 22050, 256)
    assert c.vocoder_config.upsample_rates == (8, 8, 2, 2)


def test_reference_vocoder_json_loads_unchanged():
    """The standalone vocoder JSON (reference ``env.py:8-11`` AttrDict load,
    ``train.py:424-425``) must parse as-is too."""
    from bvsc_tpu.config import load_vocoder_json

    v = load_vocoder_json(
        "/root/reference/third_party/BigVGAN/bigvgan_base_22khz_80band.json"
    )
    assert v.resblock == "1"
    assert v.num_mels == 80
    assert v.upsample_rates == (8, 8, 2, 2)
    assert v.upsample_kernel_sizes == (16, 16, 4, 4)
    assert v.upsample_initial_channel == 512  # base model, not the tiny one
    assert v.resblock_kernel_sizes == (3, 7, 11)
    assert v.resblock_dilation_sizes == ((1, 3, 5),) * 3
    assert v.activation == "snakebeta" and v.snake_logscale is True
    assert v.resolutions == ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))
    assert v.mpd_reshapes == (2, 3, 5, 7, 11)
    assert v.use_spectral_norm is False
    assert v.discriminator_channel_mult == 1
    assert v.total_upsample == 256
