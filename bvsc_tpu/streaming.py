"""Streaming runtime: chunked encode/decode at the 34.8 ms algorithmic latency.

The reference is causal end-to-end (512-sample STFT lookahead + 256-sample
hop = 34.8 ms, reference ``README.md:19``) and its BVRNN already exposes the
carried hidden state (``bvrnn.py:163-171,209,229``), but it ships no
streaming driver.  This module provides one, built from explicit state
pytrees so every step is a fixed-shape jitted XLA program:

  * streaming mel: rolling 1024-sample window, one frame per 256-sample hop
    (reflect pre-roll at stream start; flush() reflects the tail like the
    one-shot right padding),
  * streaming BVRNN: ``encode_with_state`` / ``decode`` with carried h,
  * streaming vocoder: per-conv left-context buffers + transposed-conv
    overlap-add carries, emitting exactly hop x frames finalized samples per
    frame — bit-identical to the one-shot generator output prefix.

Chunked output == one-shot output exactly (tested), which is the property
that makes the codec deployable as a real-time packet codec.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bvsc_tpu.codec import SCALING
from bvsc_tpu.config import CodecConfig, VocoderConfig
from bvsc_tpu.models import bvrnn as bvrnn_mod
from bvsc_tpu.models import vocoder as voc_mod
from bvsc_tpu.ops.conv import conv1d, conv_transpose1d, conv_weight
from bvsc_tpu.ops.mel import MelFrontend, stft_magnitude, dynamic_range_compression
from bvsc_tpu.ops.snake import apply_activation

# ---------------------------------------------------------------------------
# Streaming vocoder: state init + step
# ---------------------------------------------------------------------------


def voc_compute_dtype(codec):
    """The streaming vocoder's compute dtype for this codec's serving
    contract: bf16 when ``codec.voc_dtype == 'bf16'`` (precision='default'
    serving), else None (no cast — f32, reference parity).  Keeps the
    streaming/tick paths numerically consistent with the offline
    ``codec._voc_cast`` fast path."""
    return jnp.bfloat16 if getattr(codec, "voc_dtype", "f32") == "bf16" else None


def voc_state_dtype(codec):
    """Dtype for :func:`generator_stream_init` state buffers — must match
    the step's compute dtype (state carries concatenate with activations)."""
    cd = voc_compute_dtype(codec)
    return cd if cd is not None else codec.bvrnn_cfg.dtype


def _conv_state(batch: int, ch: int, k: int, dilation: int, dtype) -> jax.Array:
    """Left-context buffer of (k-1)*dilation zeros (== one-shot zero pads)."""
    return jnp.zeros((batch, ch, (k - 1) * dilation), dtype)


def _stream_conv(state: jax.Array, x: jax.Array, p: dict, dilation: int = 1,
                 precision=None):
    """Causal conv step: consume (B, C, T), emit (B, C', T), carry context."""
    ctx = jnp.concatenate([state, x], axis=-1)
    y = conv1d(ctx, p, dilation=dilation, precision=precision)
    klen = state.shape[-1]
    new_state = ctx[..., ctx.shape[-1] - klen :] if klen else state
    return new_state, y


def _stream_conv_transpose(state: jax.Array, x: jax.Array, p: dict, stride: int,
                           precision=None):
    """Transposed-conv step with overlap-add carry.

    Emits exactly stride*T finalized samples; the (k - stride)-sample tail
    (which future inputs still add into) is carried.  Bias is added only to
    emitted samples to avoid double counting in the overlap region.
    """
    bias = p.get("b")
    p_nobias = {k: v for k, v in p.items() if k != "b"}
    y = conv_transpose1d(x, p_nobias, stride=stride,
                         precision=precision)  # (B, C', (T-1)s + k)
    k = conv_weight(p).shape[-1]
    overlap = k - stride
    if overlap:
        y = y.at[..., :overlap].add(state)
    emit_len = stride * x.shape[-1]
    emit = y[..., :emit_len]
    new_state = y[..., emit_len : emit_len + overlap]
    if bias is not None:
        emit = emit + bias[None, :, None]
    return new_state, emit


def generator_stream_init(
    cfg: VocoderConfig, batch: int, dtype=jnp.float32
) -> dict:
    """Zero state pytree for the streaming generator (causal configs only)."""
    if any(cfg.layers_sym) or cfg.pre_sym or cfg.post_sym:
        raise ValueError("streaming requires a fully causal vocoder config")
    if any(cfg.layers_antialias) or cfg.antialias_post:
        raise ValueError("streaming is incompatible with anti-aliased activations")
    C0 = cfg.upsample_initial_channel
    state: dict = {
        "conv_pre": _conv_state(batch, cfg.num_mels, 7, 1, dtype),
        "ups": [],
        "resblocks": [],
    }
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        in_ch = C0 // (2**i)
        out_ch = C0 // (2 ** (i + 1))
        state["ups"].append(jnp.zeros((batch, out_ch, k - u), dtype))
        for ksz, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            state["resblocks"].append(
                {
                    "convs1": [_conv_state(batch, out_ch, ksz, d, dtype) for d in dils],
                    "convs2": [_conv_state(batch, out_ch, ksz, 1, dtype) for _ in dils],
                }
            )
    ch = C0 // (2 ** len(cfg.upsample_rates))
    state["conv_post"] = _conv_state(batch, ch, 7, 1, dtype)
    return state


def generator_stream_step(
    params: dict, cfg: VocoderConfig, state: dict, mel: jax.Array, *,
    precision=None, approx_snake: bool = False, compute_dtype=None,
) -> tuple[dict, jax.Array]:
    """Consume (B, num_mels, T) mel frames, emit (B, 1, T*prod(upsample))
    finalized waveform samples (one-shot prefix equality).

    The serving knobs mirror ``models.vocoder.generator_apply`` so a fast
    codec (``precision='default'``) gets the SAME numerics streaming and
    offline: ``precision`` for the conv MXU passes, ``approx_snake`` for
    the polynomial sin^2 snake, ``compute_dtype`` (e.g. ``jnp.bfloat16``)
    casts params+mel in-program (one fused ~MB convert pass; the state
    pytree must already be in ``compute_dtype`` — see
    :func:`generator_stream_init`).  Waveform is returned in the compute
    dtype; callers cast to f32 before un-scaling."""
    if compute_dtype is not None:
        params = jax.tree.map(lambda a: a.astype(compute_dtype), params)
        mel = mel.astype(compute_dtype)
    num_k = len(cfg.resblock_kernel_sizes)
    new_state = {"ups": [], "resblocks": []}

    new_state["conv_pre"], x = _stream_conv(
        state["conv_pre"], mel, params["conv_pre"], precision=precision
    )

    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        st, x = _stream_conv_transpose(
            state["ups"][i], x, params["ups"][i], stride=u, precision=precision
        )
        new_state["ups"].append(st)
        xs = None
        for j, (ksz, dils) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            ridx = i * num_k + j
            rstate = state["resblocks"][ridx]
            rparams = params["resblocks"][ridx]
            new_rstate = {"convs1": [], "convs2": []}
            xb = x
            for jj, d in enumerate(dils):
                xt = apply_activation(
                    xb, rparams["acts"][2 * jj], kind=cfg.activation,
                    logscale=cfg.snake_logscale, approx=approx_snake,
                )
                st1, xt = _stream_conv(
                    rstate["convs1"][jj], xt, rparams["convs1"][jj], dilation=d,
                    precision=precision,
                )
                xt = apply_activation(
                    xt, rparams["acts"][2 * jj + 1], kind=cfg.activation,
                    logscale=cfg.snake_logscale, approx=approx_snake,
                )
                st2, xt = _stream_conv(
                    rstate["convs2"][jj], xt, rparams["convs2"][jj],
                    precision=precision,
                )
                new_rstate["convs1"].append(st1)
                new_rstate["convs2"].append(st2)
                xb = xt + xb
            new_state["resblocks"].append(new_rstate)
            xs = xb if xs is None else xs + xb
        x = xs / num_k

    x = apply_activation(
        x, params["act_post"], kind=cfg.activation, logscale=cfg.snake_logscale,
        approx=approx_snake,
    )
    new_state["conv_post"], x = _stream_conv(
        state["conv_post"], x, params["conv_post"], precision=precision
    )
    return new_state, jnp.tanh(x)


# ---------------------------------------------------------------------------
# Streaming codec driver
# ---------------------------------------------------------------------------


class StreamingEncoder:
    """Samples in -> binary codes out, one code vector per 256-sample hop.

    First code is emitted after ``winsize - pad_left = 768`` samples
    (= 512-sample lookahead + one hop = 34.8 ms at 22.05 kHz).
    """

    def __init__(self, codec, batch: int = 1, bitrate: float = 3000.0):
        self.codec = codec
        conf: CodecConfig = codec.conf
        self.hop = conf.hopsize
        self.win = conf.winsize
        self.pad_left = conf.mel_pad_left
        self.pad_right = conf.winsize - conf.mel_pad_left - conf.hopsize
        self.bits = codec.bits_per_frame(bitrate)
        self.batch = batch
        self.h = jnp.zeros((batch, conf.h_dim), codec.bvrnn_cfg.dtype)
        # host-side raw sample queue holding the padded stream tail
        self._buf = np.zeros((batch, 0), np.float32)
        self._started = False
        self._flushed = False

        frontend: MelFrontend = codec.frontend

        @functools.partial(jax.jit, static_argnames=("n_frames",))
        def mel_frames(segment: jax.Array, n_frames: int) -> jax.Array:
            """(B, (n_frames-1)*hop + win) padded samples -> (B, n, M) log-mel."""
            mag = stft_magnitude(
                segment * SCALING, frontend.n_fft, frontend.hop_size,
                frontend.window, use_matmul_dft=frontend.use_matmul_dft,
                dft_bases=frontend._dft,
            )
            mel = jnp.matmul(frontend.mel_basis, mag,
                             precision=jax.lax.Precision.HIGHEST)
            return jnp.swapaxes(dynamic_range_compression(mel), 1, 2)

        def encode_frames(params, mel, h, bits):
            B, T, _ = mel.shape
            return bvrnn_mod.encode_with_state(
                params, codec.bvrnn_cfg, mel, jnp.full((B, T), bits), h
            )

        self._mel_frames = mel_frames
        self._encode = jax.jit(encode_frames)

    def feed(self, samples: np.ndarray) -> np.ndarray:
        """Push (batch, n) samples; returns (batch, n_new_frames, z_dim) codes
        (possibly zero frames)."""
        assert not self._flushed, "stream already flushed"
        samples = np.asarray(samples, np.float32).reshape(self.batch, -1)
        if not self._started:
            if self._buf.shape[1] + samples.shape[1] < self.pad_left + 1:
                self._buf = np.concatenate([self._buf, samples], axis=1)
                return np.zeros((self.batch, 0, self.codec.conf.z_dim), np.float32)
            x = np.concatenate([self._buf, samples], axis=1)
            # reflect pre-roll, identical to one-shot left padding
            pre = x[:, 1 : self.pad_left + 1][:, ::-1]
            self._buf = np.concatenate([pre, x], axis=1)
            self._started = True
        else:
            self._buf = np.concatenate([self._buf, samples], axis=1)
        return self._drain()

    def flush(self) -> np.ndarray:
        """Reflect-pad the tail (one-shot right padding) and emit the rest."""
        assert self._started and not self._flushed
        self._flushed = True
        tail = self._buf[:, -self.pad_right - 1 : -1][:, ::-1]
        self._buf = np.concatenate([self._buf, tail], axis=1)
        return self._drain()

    def _drain(self) -> np.ndarray:
        n = (self._buf.shape[1] - self.win) // self.hop + 1
        if n <= 0:
            return np.zeros((self.batch, 0, self.codec.conf.z_dim), np.float32)
        seg_len = (n - 1) * self.hop + self.win
        seg = self._buf[:, :seg_len]
        self._buf = self._buf[:, n * self.hop :]
        mel = self._mel_frames(jnp.asarray(seg), n_frames=n)
        codes, self.h = self._encode(self.codec.bvrnn_params, mel, self.h, self.bits)
        return np.asarray(codes)


class StreamingDecoder:
    """Binary codes in -> waveform out, 256 samples per code frame.

    conceal_bitrate: bps (scalar or per-stream (batch,) array) masking
    PLC-concealed frames to the stream's real bit allocation (the
    receiver knows it, e.g. from the .bvsc table); None conceals with all
    ``z_dim`` prior bits."""

    def __init__(self, codec, batch: int = 1, conceal_bitrate=None):
        self.codec = codec
        conf: CodecConfig = codec.conf
        self.batch = batch
        self.h = jnp.zeros((batch, conf.h_dim), codec.bvrnn_cfg.dtype)
        self.voc_state = generator_stream_init(
            conf.vocoder_config, batch, voc_state_dtype(codec)
        )
        # conceal_bits == z_dim is identical to "all prior bits" (the mask
        # saturates), so one code path serves both cases
        cb = (float(conf.z_dim) if conceal_bitrate is None
              else codec.bits_per_frame(conceal_bitrate))
        self.conceal_bits = jnp.broadcast_to(
            jnp.asarray(cb, jnp.float32), (batch,)
        )

        vknobs = dict(precision=codec.bvrnn_cfg.precision,
                      approx_snake=codec.approx_snake,
                      compute_dtype=voc_compute_dtype(codec))

        def decode_frames(params, voc_params, codes, h, voc_state):
            mel, h = bvrnn_mod.decode(params, codec.bvrnn_cfg, codes, h)
            voc_state, wav = generator_stream_step(
                voc_params, conf.vocoder_config, voc_state,
                jnp.swapaxes(mel, 1, 2), **vknobs
            )
            return wav[:, 0, :].astype(jnp.float32) / SCALING, h, voc_state

        def conceal_frames(params, voc_params, codes, lost, cbits, h, voc_state):
            cb = jnp.broadcast_to(cbits[:, None], codes.shape[:2])
            mel, h = bvrnn_mod.decode_plc(
                params, codec.bvrnn_cfg, codes, lost, h, cb
            )
            voc_state, wav = generator_stream_step(
                voc_params, conf.vocoder_config, voc_state,
                jnp.swapaxes(mel, 1, 2), **vknobs
            )
            return wav[:, 0, :].astype(jnp.float32) / SCALING, h, voc_state

        self._decode = jax.jit(decode_frames)
        self._decode_plc = jax.jit(conceal_frames)

    def feed(self, codes: np.ndarray, lost: np.ndarray | None = None) -> np.ndarray:
        """Push (batch, n, z_dim) code frames; returns (batch, n*hop) samples.

        lost: optional (batch, n) 0/1 mask of frames whose packets never
        arrived — their codes are ignored and concealed from the BVRNN's own
        prior (``models.bvrnn.decode_plc``)."""
        # dtype-preserving: codes already on device (e.g. from conceal())
        # must not round-trip through the ~30 MB/s host tunnel
        codes = jnp.asarray(codes, jnp.float32)
        if codes.shape[1] == 0:
            return np.zeros((self.batch, 0), np.float32)
        if lost is not None:
            wav, self.h, self.voc_state = self._decode_plc(
                self.codec.bvrnn_params, self.codec.vocoder_params, codes,
                jnp.asarray(np.asarray(lost, np.float32)), self.conceal_bits,
                self.h, self.voc_state,
            )
        else:
            wav, self.h, self.voc_state = self._decode(
                self.codec.bvrnn_params, self.codec.vocoder_params, codes,
                self.h, self.voc_state,
            )
        return np.asarray(wav)

    def conceal(self, n_frames: int = 1) -> np.ndarray:
        """Emit audio for ``n_frames`` lost packets (prior-based PLC): the
        decoder free-runs on the prior's expected codes ``P(z_t | h_t)``
        and the vocoder keeps streaming — 256 samples per lost 11.6 ms
        frame, no gap in the output.  Subsequent received frames
        re-converge the hidden state (tested in test_plc.py)."""
        codes = jnp.full(
            (self.batch, n_frames, self.codec.conf.z_dim), 0.5, jnp.float32
        )
        return self.feed(codes, lost=np.ones((self.batch, n_frames), np.float32))


@functools.partial(
    jax.jit,
    static_argnames=("bcfg", "vcfg", "frontend", "approx_snake", "voc_dtype"),
)
def _fused_packet_step(
    params, voc_params, state, chunk, bits, *, bcfg, vcfg, frontend,
    approx_snake=False, voc_dtype="f32",
):
    """ONE dispatch per 256-sample packet: window roll -> mel -> fused BVRNN
    encode_decode step -> streaming vocoder step.

    state: {window (B, 1024), h (B, h_dim), voc (pytree)}.
    Returns (state, codes (B, z), wav (B, 256)).

    ``approx_snake`` / ``voc_dtype`` mirror the codec's offline serving
    knobs (``BVRNNCodecModel(precision='default')`` threads them here via
    :class:`FusedPacketCodec`) so the packet path and the one-shot path run
    the SAME vocoder numerics; the conv precision follows ``bcfg.precision``
    like every offline program.  With ``voc_dtype='bf16'`` the state's
    ``voc`` pytree must be bf16 (:func:`generator_stream_init`).

    A single GRU state serves both ends — the closed-loop state-sync
    invariant (reference ``bvrnn.py:204-206`` == ``:226-227``) means the
    encoder's and decoder's hidden trajectories are identical given the
    codes, so ``encode_decode`` emits codes AND the decoded mel in one pass
    (half the per-packet BVRNN matmuls of an encode step + decode step).
    """
    hop = chunk.shape[-1]
    window = jnp.concatenate([state["window"][:, hop:], chunk], axis=-1)
    frames = window * SCALING * frontend.window
    cos_b, sin_b = frontend._dft
    re = jnp.matmul(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im + 1e-9)
    mel = dynamic_range_compression(
        jnp.matmul(mag, frontend.mel_basis.T,
                   precision=jax.lax.Precision.HIGHEST)
    )  # (B, M) — HIGHEST like the one-shot mel (ops/mel.py), else TPU bf16
    # passes can flip a near-0.5 code bit and break one-shot parity

    codes, mel_hat, h = bvrnn_mod.encode_decode(
        params, bcfg, mel[:, None, :], bits[:, None], state["h"]
    )
    voc_state, wav = generator_stream_step(
        voc_params, vcfg, state["voc"], jnp.swapaxes(mel_hat, 1, 2),
        precision=bcfg.precision, approx_snake=approx_snake,
        compute_dtype=jnp.bfloat16 if voc_dtype == "bf16" else None,
    )
    new_state = {"window": window, "h": h, "voc": voc_state}
    return new_state, codes[:, 0, :], wav[:, 0, :].astype(jnp.float32) / SCALING


class FusedPacketCodec:
    """Real-time packet codec: one jitted XLA call per 11.6 ms packet.

    The rolling mel window lives on device inside the state, so per packet
    only 256 samples cross the host boundary and exactly one program runs —
    the minimal-latency configuration for live streaming (the class-based
    Streaming{Encoder,Decoder} pipeline issues ~3 dispatches per packet).
    Output equals the one-shot codec exactly.
    """

    def __init__(self, codec, batch: int = 1, bitrate: float = 3000.0):
        self.codec = codec
        conf: CodecConfig = codec.conf
        self.hop = conf.hopsize
        self.winsize = conf.winsize
        self.pad_left = conf.mel_pad_left
        self.pad_right = conf.winsize - conf.mel_pad_left - conf.hopsize
        self.batch = batch
        dtype = codec.bvrnn_cfg.dtype
        self.bits = jnp.full((batch,), codec.bits_per_frame(bitrate), jnp.float32)
        self.state = {
            "window": jnp.zeros((batch, conf.winsize), jnp.float32),
            "h": jnp.zeros((batch, conf.h_dim), dtype),
            "voc": generator_stream_init(
                conf.vocoder_config, batch, voc_state_dtype(codec)
            ),
        }
        self._prefix = np.zeros((batch, 0), np.float32)
        self._tail = np.zeros((batch, 0), np.float32)  # last pad_right+1 samples
        self._started = False
        self._flushed = False

    def _step(self, chunk_dev) -> tuple[np.ndarray, np.ndarray]:
        self.state, codes, wav = _fused_packet_step(
            self.codec.bvrnn_params, self.codec.vocoder_params, self.state,
            chunk_dev, self.bits,
            bcfg=self.codec.bvrnn_cfg, vcfg=self.codec.conf.vocoder_config,
            frontend=self.codec.frontend,
            approx_snake=self.codec.approx_snake,
            voc_dtype=self.codec.voc_dtype,
        )
        return codes, wav

    def process(self, samples: np.ndarray) -> np.ndarray:
        """Push (batch, n*hop) samples; returns decoded audio for every
        completed frame (possibly empty)."""
        assert not self._flushed
        samples = np.asarray(samples, np.float32).reshape(self.batch, -1)
        self._tail = np.concatenate([self._tail, samples], axis=1)[
            :, -(self.pad_right + 1) :
        ]
        if not self._started:
            self._prefix = np.concatenate([self._prefix, samples], axis=1)
            need = self.winsize - self.pad_left  # 768
            if self._prefix.shape[1] < need:
                return np.zeros((self.batch, 0), np.float32)
            x = self._prefix
            # first frame's window: [reflect pre-roll | x[:768]]; pre-load the
            # state so rolling in the final hop reproduces it exactly
            pre = x[:, 1 : self.pad_left + 1][:, ::-1]
            window0 = np.concatenate([pre, x[:, :need]], axis=1)
            self.state["window"] = jnp.asarray(
                np.concatenate(
                    [np.zeros((self.batch, self.hop), np.float32),
                     window0[:, : -self.hop]],
                    axis=1,
                )
            )
            outs = [np.asarray(self._step(jnp.asarray(window0[:, -self.hop :]))[1])]
            self._started = True
            rest = x[:, need:]
            self._prefix = np.zeros((self.batch, 0), np.float32)
            if rest.shape[1]:
                outs.append(self._drain(rest))
            return np.concatenate(outs, axis=1)
        return self._drain(samples)

    def _drain(self, samples: np.ndarray) -> np.ndarray:
        self._prefix = np.concatenate([self._prefix, samples], axis=1)
        outs = []
        while self._prefix.shape[1] >= self.hop:
            chunk = self._prefix[:, : self.hop]
            self._prefix = self._prefix[:, self.hop :]
            outs.append(np.asarray(self._step(jnp.asarray(chunk))[1]))
        if not outs:
            return np.zeros((self.batch, 0), np.float32)
        return np.concatenate(outs, axis=1)

    def flush(self) -> np.ndarray:
        """Reflect-pad the tail (one-shot right padding).  Exactly two more
        frames belong to the one-shot output: the last one-shot frame's
        window ends precisely at the end of the reflected padding."""
        assert self._started and not self._flushed
        self._flushed = True
        tail = self._tail[:, -self.pad_right - 1 : -1][:, ::-1]
        leftover = self._prefix.shape[1]
        pad = (-(leftover + tail.shape[1])) % self.hop
        ext = np.concatenate([tail, np.zeros((self.batch, pad), np.float32)], axis=1)
        out = self._drain(ext)
        return out[:, : 2 * self.hop]


class StreamingCodec:
    """Full-duplex convenience wrapper: samples -> codes -> samples."""

    def __init__(self, codec, batch: int = 1, bitrate: float = 3000.0):
        self.encoder = StreamingEncoder(codec, batch, bitrate)
        self.decoder = StreamingDecoder(codec, batch)

    def process(self, samples: np.ndarray) -> np.ndarray:
        return self.decoder.feed(self.encoder.feed(samples))

    def flush(self) -> np.ndarray:
        return self.decoder.feed(self.encoder.flush())
