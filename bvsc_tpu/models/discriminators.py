"""GAN discriminators: Multi-Period (MPD) and Multi-Resolution (MRD).

Functional JAX re-creation of the reference discriminators
(``third_party/BigVGAN/models.py:251-408``):

  * ``DiscriminatorP``: reshapes the waveform to (T/p, p) and applies a
    stack of (5,1)-kernel stride-(3,1) 2-D convs; one per period in
    ``mpd_reshapes`` = [2, 3, 5, 7, 11].
  * ``DiscriminatorR``: |STFT| at one resolution followed by (3,9) 2-D
    convs; one per ``resolutions`` = [[1024,120,600], [2048,240,1200],
    [512,50,240]].

Convolutions are weight-normed ({'g','v'} params) by default, or
spectral-normed ({'w_orig','b','sn_u','sn_v'}) when ``use_spectral_norm``
is set (reference ``models.py:256``); the MRD additionally honors the
``mrd_use_spectral_norm`` / ``mrd_channel_mult`` overrides
(reference ``models.py:329-337``).  Returns (logits, fmap) per
sub-discriminator, matching the reference's (y_d_rs, y_d_gs, fmap_rs,
fmap_gs) contract via :func:`mpd_apply` / :func:`mrd_apply` on (y, y_hat).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bvsc_tpu.config import VocoderConfig
from bvsc_tpu.ops.conv import conv2d, init_conv2d_params

LRELU_SLOPE = 0.1  # reference models.py:23


# ---------------------------------------------------------------------------
# Multi-Period Discriminator
# ---------------------------------------------------------------------------


def init_discriminator_p_params(key, cfg: VocoderConfig, dtype=jnp.float32):
    d = cfg.discriminator_channel_mult
    sn = cfg.use_spectral_norm
    chans = [1, int(32 * d), int(128 * d), int(512 * d), int(1024 * d), int(1024 * d)]
    keys = jax.random.split(key, 6)
    convs = [
        init_conv2d_params(keys[i], chans[i + 1], chans[i], (5, 1),
                           weight_norm=not sn, spectral_norm=sn, dtype=dtype)
        for i in range(5)
    ]
    post = init_conv2d_params(keys[5], 1, chans[5], (3, 1),
                              weight_norm=not sn, spectral_norm=sn, dtype=dtype)
    return {"convs": convs, "conv_post": post}


def discriminator_p_apply(params, x: jax.Array, period: int):
    """x: (B, 1, T) -> (logits (B, n), fmap list) (reference models.py:272-291)."""
    B, C, T = x.shape
    if T % period != 0:
        n_pad = period - (T % period)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad)), mode="reflect")
        T = T + n_pad
    x = x.reshape(B, C, T // period, period)

    fmap = []
    strides = [(3, 1)] * 4 + [(1, 1)]
    pads = [(2, 0)] * 5
    for p, s, pad in zip(params["convs"], strides, pads):
        x = conv2d(x, p, stride=s, padding=pad)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = conv2d(x, params["conv_post"], padding=(1, 0))
    fmap.append(x)
    return x.reshape(B, -1), fmap


def init_mpd_params(key, cfg: VocoderConfig, dtype=jnp.float32):
    keys = jax.random.split(key, len(cfg.mpd_reshapes))
    return [init_discriminator_p_params(k, cfg, dtype) for k in keys]


def mpd_apply(params, cfg: VocoderConfig, y: jax.Array, y_hat: jax.Array):
    """(y, y_hat): (B, 1, T) real/generated.  Returns
    (y_d_rs, y_d_gs, fmap_rs, fmap_gs) like reference models.py:303-316."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for p, period in zip(params, cfg.mpd_reshapes):
        dr, fr = discriminator_p_apply(p, y, period)
        dg, fg = discriminator_p_apply(p, y_hat, period)
        y_d_rs.append(dr)
        y_d_gs.append(dg)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# Multi-Resolution Discriminator
# ---------------------------------------------------------------------------


def _mrd_spectral_norm(cfg: VocoderConfig) -> bool:
    """MRD norm choice honoring the mrd_use_spectral_norm override
    (reference models.py:329-333)."""
    if cfg.mrd_use_spectral_norm is not None:
        return cfg.mrd_use_spectral_norm
    return cfg.use_spectral_norm


def init_discriminator_r_params(key, cfg: VocoderConfig, dtype=jnp.float32):
    # mrd_channel_mult override (reference models.py:334-337)
    d = (cfg.mrd_channel_mult if cfg.mrd_channel_mult is not None
         else cfg.discriminator_channel_mult)
    sn = _mrd_spectral_norm(cfg)
    c = int(32 * d)
    keys = jax.random.split(key, 6)
    kw = dict(weight_norm=not sn, spectral_norm=sn, dtype=dtype)
    return {
        "convs": [
            init_conv2d_params(keys[0], c, 1, (3, 9), **kw),
            init_conv2d_params(keys[1], c, c, (3, 9), **kw),
            init_conv2d_params(keys[2], c, c, (3, 9), **kw),
            init_conv2d_params(keys[3], c, c, (3, 9), **kw),
            init_conv2d_params(keys[4], c, c, (3, 3), **kw),
        ],
        "conv_post": init_conv2d_params(keys[5], 1, c, (3, 3), **kw),
    }


def _resolution_spectrogram(x: jax.Array, resolution) -> jax.Array:
    """|STFT| magnitude at (n_fft, hop, win), rectangular window zero-padded
    to n_fft, reflect pre-pad (n_fft - hop)/2 (reference models.py:369-379)."""
    n_fft, hop, win = resolution
    pad = (n_fft - hop) // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    x = x[:, 0, :]  # (B, T)
    # frame (center=False) via XLA patch extraction, and DFT via matmul:
    # both have conv/matmul backwards — jnp.fft.rfft's gradient is
    # pathologically slow to AOT-compile on this TPU stack (~10 min per
    # resolution), a plain gather's scatter-add backward likewise
    from bvsc_tpu.ops.mel import _frame, dft_real_bases

    frames = _frame(x, n_fft, hop)  # (B, F, n_fft)
    wpad = (n_fft - win) // 2
    mask = np.zeros(n_fft, np.float32)
    mask[wpad : wpad + win] = 1.0
    frames = frames * mask
    cos_b, sin_b = dft_real_bases(n_fft)
    re = jnp.matmul(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    return jnp.swapaxes(mag, -1, -2)  # (B, n_bins, F)


def discriminator_r_apply(params, x: jax.Array, resolution):
    """x: (B, 1, T) -> (logits, fmap) (reference models.py:354-367)."""
    return discriminator_r_apply_mag(params, _resolution_spectrogram(x, resolution))


def discriminator_r_apply_mag(params, mag: jax.Array):
    """Conv stack on a precomputed |STFT| magnitude (B, bins, frames) —
    split out so the spectrogram and the conv backward can live in separate
    XLA programs (the combination OOMs tunneled AOT compile helpers)."""
    x = mag[:, None, :, :]  # (B, 1, bins, frames)
    fmap = []
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    pads = [(1, 4), (1, 4), (1, 4), (1, 4), (1, 1)]
    for p, s, pad in zip(params["convs"], strides, pads):
        x = conv2d(x, p, stride=s, padding=pad)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = conv2d(x, params["conv_post"], padding=(1, 1))
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def init_mrd_params(key, cfg: VocoderConfig, dtype=jnp.float32):
    keys = jax.random.split(key, len(cfg.resolutions))
    return [init_discriminator_r_params(k, cfg, dtype) for k in keys]


def mrd_apply(params, cfg: VocoderConfig, y: jax.Array, y_hat: jax.Array):
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for p, res in zip(params, cfg.resolutions):
        dr, fr = discriminator_r_apply(p, y, res)
        dg, fg = discriminator_r_apply(p, y_hat, res)
        y_d_rs.append(dr)
        y_d_gs.append(dg)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs
