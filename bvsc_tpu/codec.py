"""Codec orchestration: the reference-compatible public API.

Mirrors the reference ``BVRNNCodecModel`` surface
(``bvrnn_codec_model.py:19-76``): construct from a TOML config plus BVRNN /
vocoder checkpoints, then ``encode(x, bitrate)``, ``decode(codes, length)``
and ``__call__(x, bitrate)``.  All compute paths are jitted XLA programs:
mel frontend -> BVRNN encode scan -> BVRNN decode scan -> vocoder.

Differences from the reference (TPU-first, capability-preserving):
  * checkpoints may be torch files (converted on load), Orbax directories,
    or in-memory pytrees; with none given the model is randomly initialised
    (the reference's LFS checkpoints are not distributable),
  * input lengths are bucketed (padded up to a multiple of ``hop *
    length_bucket``) so jit recompiles O(log L) times instead of per-length,
  * a ``dtype`` knob selects float32 (reference parity) or bfloat16
    (≈2x less HBM traffic in the weight-bound scans).
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bvsc_tpu.config import CodecConfig, load_config
from bvsc_tpu.models import bvrnn as bvrnn_mod
from bvsc_tpu.models import vocoder as voc_mod
from bvsc_tpu.ops.mel import MelFrontend

# -10 dB input scaling, undone after the vocoder (reference
# bvrnn_codec_model.py:17,49,71)
SCALING = 10 ** (-10 / 20)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CONFIG = os.path.join(_REPO_ROOT, "configs", "varbitrate.toml")


class BVRNNCodecModel:
    """Bitrate-scalable neural speech codec (public API parity with the
    reference ``BVRNNCodecModel``)."""

    def __init__(
        self,
        config_path: str = DEFAULT_CONFIG,
        bvrnn_chkpt_path: str | None = None,
        vocoder_chkpt_path: str | None = None,
        *,
        config: CodecConfig | None = None,
        bvrnn_params: Any | None = None,
        vocoder_params: Any | None = None,
        dtype: Any = jnp.float32,
        seed: int = 0,
        length_bucket: int = 64,
        precision: str = "highest",
        quantize: str | None = None,
        use_pallas: bool | None = None,
        approx_snake: bool | None = None,
        voc_dtype: str | None = None,
        fused_cell: bool | None = None,
        scan_unroll: int = 1,
    ):
        """precision: 'highest' (reference-parity f32 matmul passes) or
        'default' — the fast serving config: single-pass bf16 MXU matmuls
        AND (since r3) approx_snake + a bf16 vocoder segment by default.
        Codes may differ in rare near-0.5 rounding cases (~99.9%
        agreement); the waveform contract for the full 'default' stack is
        ~2e-2 max abs error vs parity mode (tests/test_codec.py
        test_fast_serving_mode) — bf16-MXU-only numerics (~1e-3) are
        available via precision='default', approx_snake=False,
        voc_dtype='f32'.  The same knobs now apply on EVERY serving path:
        offline decode/forward, streaming (FusedPacketCodec,
        StreamingDecoder), the batched engines, and exported bundles.

        approx_snake: polynomial sin^2 snake activations in the vocoder
        (``ops.snake.sin_sq_approx``; <2e-4 abs activation error, ~2x the
        snake pass — snake is ~80% of generator time on this chip).  None
        (default) ties it to the precision knob: ON for 'default', OFF for
        'highest' (reference parity).  Pass an explicit bool to override
        either way.  Not compatible with use_pallas (exact-snake kernels).

        voc_dtype: 'f32' or 'bf16' — activation/weight dtype for the
        vocoder segment only (codes are computed by the BVRNN scans and
        are unaffected).  None ties it to the precision knob like
        approx_snake: 'bf16' for 'default', 'f32' for 'highest'.  With
        approx_snake the elementwise passes become byte-bound, so bf16
        halves them (41.9 vs 64.1 ms for the B=128 4 s generator;
        waveform error vs f32-exact is ~1.1e-4 — the same contract as
        the bf16 MXU passes; benchmarks/probe_fast_snake.py).

        quantize: None, 'int8', or 'int8_mixed' — weight-only int8 BVRNN
        weights (per-channel scales; ~2.5x faster HBM-bound single-stream
        scans, ~99.85% code agreement).  'int8_mixed' keeps the
        code-critical enc+phi_x stacks in bf16 (~99.95% agreement for ~20%
        more weight traffic; see ops.quant).

        fused_cell: True/False/'auto' — run the BVRNN scans with the
        weight-concatenated fused step (models.bvrnn fused-cell section):
        13 dots/step instead of 15 dots + 3 concats + 2 GRU dots — the
        lever against the op-count-bound small-batch scans (VERDICT r4
        #2b; measured 3.69x at B=1, 0.95x at B=128,
        benchmarks/probe_scan_cell.py).  'auto' (the None default for
        precision='default') picks fused for traced batch <
        models.bvrnn.FUSED_AUTO_MAX_B and standard above — so
        single-stream/streaming paths get the 3.7x while the batched
        engines keep the compute-bound optimum.  It changes float
        reassociation (rare near-0.5 code flips — the standard fast-mode
        contract); OFF for 'highest' (reference parity) and whenever
        quantize= is set (int8 dict weights can't be re-concatenated).
        All serving paths (offline, streaming, engines, bundles) read it
        from bvrnn_cfg, so a given batch size sees one cell end to end.

        scan_unroll: lax.scan unroll factor for the BVRNN frame loops
        (scheduling only — numerics unchanged).

        use_pallas: run the vocoder residual stacks as fused, space-to-depth
        folded Pallas TPU kernels (``ops.pallas_voc``).  Default OFF: on the
        axon-virtualized v5e used here, Mosaic dot throughput measures
        1.4-5.7 TFLOP/s with ~30 us/grid-step overhead, so the fused kernel
        LOSES to XLA's direct convs (~70 vs ~48 ms per residual stage at
        B=128) — re-confirmed r4 under the corrected dispatch-amortized
        methodology (benchmarks/README.md: folded 56.4 vs direct 41.6 ms),
        where the direct path measures ~1.0x of the chip's ~475 GB/s stream
        ceiling by XLA cost_analysis bytes.  The kernel is equivalence
        -tested (tests/test_pallas_voc.py) and retained for non-virtualized
        TPU runtimes where fusing a whole resblock into two HBM passes is
        a ~5x win on paper."""
        self.conf = config if config is not None else load_config(config_path)
        conf = self.conf
        self.dtype = dtype
        self.length_bucket = length_bucket
        self.precision = (
            jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT
        )
        self.approx_snake = (
            bool(approx_snake) if approx_snake is not None
            else self.precision == jax.lax.Precision.DEFAULT
        )
        if voc_dtype not in (None, "f32", "bf16"):
            raise ValueError(f"voc_dtype must be 'f32' or 'bf16', got {voc_dtype!r}")
        self.voc_dtype = voc_dtype if voc_dtype is not None else (
            "bf16" if self.precision == jax.lax.Precision.DEFAULT else "f32"
        )

        if fused_cell not in (None, True, False, "auto"):
            raise ValueError(
                f"fused_cell must be True/False/'auto', got {fused_cell!r}")
        if fused_cell is None:
            self.fused_cell = (
                "auto" if (self.precision == jax.lax.Precision.DEFAULT
                           and quantize is None) else False
            )
        else:
            self.fused_cell = fused_cell
        if self.fused_cell and quantize is not None:
            raise ValueError(
                "fused_cell is not supported with quantize= (int8 dict "
                "weights cannot be re-concatenated); drop one")
        self.bvrnn_cfg = bvrnn_mod.BVRNNConfig(
            x_dim=conf.num_mels,
            h_dim=conf.h_dim,
            z_dim=conf.z_dim,
            var_bit=conf.var_bit,
            dtype=dtype,
            precision=self.precision,
            fused_cell=self.fused_cell,
            unroll=int(scan_unroll),
        )
        self.frontend = MelFrontend(
            sampling_rate=conf.fs,
            n_fft=conf.winsize,
            num_mels=conf.num_mels,
            hop_size=conf.hopsize,
            win_size=conf.winsize,
            fmin=conf.fmin,
            fmax=conf.fmax,
            padding_left=conf.mel_pad_left,
        )

        key = jax.random.key(seed)
        k1, k2 = jax.random.split(key)
        if bvrnn_params is not None:
            self.bvrnn_params = bvrnn_params
        elif bvrnn_chkpt_path is not None:
            self.bvrnn_params = _load_bvrnn_checkpoint(bvrnn_chkpt_path, dtype)
        else:
            # reference instantiates with mean=0/std=1 placeholders
            # (bvrnn_codec_model.py:30-34); real stats come from the checkpoint
            self.bvrnn_params = bvrnn_mod.init_bvrnn_params(
                k1, self.bvrnn_cfg, log_sigma_init=conf.log_sigma_init
            )
        if vocoder_params is not None:
            self.vocoder_params = vocoder_params
        elif vocoder_chkpt_path is not None:
            self.vocoder_params = _load_vocoder_checkpoint(
                vocoder_chkpt_path, conf.vocoder_config, dtype
            )
        else:
            self.vocoder_params = voc_mod.init_generator_params(
                k2, conf.vocoder_config, weight_norm=False, dtype=dtype
            )

        if quantize == "int8":
            from bvsc_tpu.ops.quant import quantize_bvrnn_params

            self.bvrnn_params = quantize_bvrnn_params(self.bvrnn_params)
        elif quantize == "int8_mixed":
            # int8 scans with the code-critical enc+phi_x stacks in bf16:
            # higher code agreement for ~20% more weight traffic (ops.quant)
            from bvsc_tpu.ops.quant import quantize_bvrnn_params_mixed

            self.bvrnn_params = quantize_bvrnn_params_mixed(self.bvrnn_params)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")

        self.use_pallas = bool(use_pallas) if use_pallas is not None else False
        if self.use_pallas:
            # the Pallas resblock kernels have their own compute-dtype knob
            # (pallas_compute, tied to `precision`) and exact snake math —
            # approx_snake / voc_dtype do not apply on that path.  Explicit
            # requests would otherwise be silently ignored; reset the
            # precision-derived defaults instead so self.* reflects what
            # actually runs.
            if approx_snake:
                raise ValueError(
                    "approx_snake=True is not supported with use_pallas "
                    "(the Pallas kernels compute exact snake); drop one"
                )
            if voc_dtype is not None:
                raise ValueError(
                    "voc_dtype is not supported with use_pallas (the Pallas "
                    "path's compute dtype follows `precision`); drop one"
                )
            self.approx_snake = False
            self.voc_dtype = "f32"
        if self.use_pallas:
            from bvsc_tpu.ops.pallas_voc import pallas_stack_supported

            if not pallas_stack_supported(conf.vocoder_config):
                raise ValueError(
                    "use_pallas requires a causal, non-antialiased "
                    "snakebeta(logscale) vocoder config"
                )
        self._voc_kernel_blocks = None
        if self.use_pallas:
            from bvsc_tpu.ops.pallas_voc import prepare_resblock_kernel_params

            self._voc_kernel_blocks = prepare_resblock_kernel_params(
                self.vocoder_params, conf.vocoder_config
            )

        self._encode_jit = jax.jit(
            functools.partial(_encode_impl, cfg=self.bvrnn_cfg),
            static_argnames=("frontend",),
        )
        self._decode_jit = jax.jit(
            functools.partial(_decode_impl, bcfg=self.bvrnn_cfg),
            static_argnames=("vcfg", "length", "pallas_compute", "approx_snake", "voc_dtype"),
        )
        self._decode_mel_jit = jax.jit(
            functools.partial(_decode_mel_impl, cfg=self.bvrnn_cfg)
        )
        self._decode_plc_jit = jax.jit(
            functools.partial(_decode_plc_impl, bcfg=self.bvrnn_cfg),
            static_argnames=("vcfg", "length", "mode", "pallas_compute", "approx_snake", "voc_dtype"),
        )
        self._forward_jit = jax.jit(
            functools.partial(_forward_impl, bcfg=self.bvrnn_cfg),
            static_argnames=("frontend", "vcfg", "length", "pallas_compute", "approx_snake", "voc_dtype"),
        )

    # -- helpers ------------------------------------------------------------

    def _pad_length(self, length: int) -> int:
        """Round up to the jit length bucket (a multiple of hop)."""
        hop = self.conf.hopsize
        bucket = hop * self.length_bucket
        return int(np.ceil(max(length, 1) / bucket) * bucket)

    def bits_per_frame(self, bitrate) -> float | np.ndarray:
        """bps -> bits/frame (reference ``bvrnn_codec_model.py:58-59``).
        Accepts a scalar or a per-frame array (VBR schedules)."""
        bits = np.round(np.asarray(bitrate, np.float64)
                        * self.conf.hopsize / self.conf.fs)
        return float(bits) if bits.ndim == 0 else bits.astype(np.float32)

    def _frame_bits(self, bitrate, batch: int, L: int, Lp: int,
                    n_frames: int):
        """bps (scalar or per-frame schedule) -> bits/frame, validated
        against the frame count and padded to the length bucket (padded
        frames get 0 bits; they are trimmed/invalidated downstream)."""
        bits = self.bits_per_frame(bitrate)
        if not np.ndim(bits):
            return bits
        frames_expected = (n_frames,) if np.ndim(bits) == 1 else (
            batch, n_frames)
        if np.shape(bits) != frames_expected:
            raise ValueError(
                f"per-frame bitrate shape {np.shape(bits)} != "
                f"{frames_expected} ({n_frames} frames for {L} samples)"
            )
        Tp = self.frontend.num_frames(Lp)
        pad = ((0, Tp - n_frames),) if np.ndim(bits) == 1 else (
            (0, 0), (0, Tp - n_frames))
        return np.pad(bits, pad)

    # -- public API ----------------------------------------------------------

    def encode(self, x, bitrate) -> jax.Array:
        """x: (batch, length) waveform; bitrate in bits/s (rounded to the
        nearest bits/frame).  Returns binary codes (batch, frames, z_dim).
        A 1-D ``(length,)`` waveform is auto-promoted to batch 1 and the
        batch axis squeezed from the result.

        VBR: ``bitrate`` may also be a per-frame array of bps — shape
        (frames,) or (batch, frames) — for mid-stream rate switches (the
        reference broadcasts one scalar, ``bvrnn_codec_model.py:58-59``,
        but its model layer is per-frame, ``bvrnn.py:180-184``; so is
        ours).  Pair with the .bvsc VBR allocation table for files."""
        x = _as_device_array(x, jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        if x.ndim != 2:
            raise ValueError(
                f"encode expects (batch, length) or (length,) waveform, got shape {x.shape}"
            )
        L = x.shape[1]
        Lp = self._pad_length(L)
        x = jnp.pad(x, ((0, 0), (0, Lp - L)))
        n_frames = self.frontend.num_frames(L)
        bits = self._frame_bits(bitrate, x.shape[0], L, Lp, n_frames)
        codes = self._encode_jit(
            self.bvrnn_params,
            x,
            jnp.asarray(bits, jnp.float32),
            frontend=self.frontend,
        )
        codes = codes[:, :n_frames]
        return codes[0] if squeeze else codes

    def decode(self, codes, length: int, *, lost=None, conceal_bitrate=None,
               conceal_mode: str = "expect") -> jax.Array:
        """codes: (batch, frames, z_dim); length: output sample count.
        2-D ``(frames, z_dim)`` codes are auto-promoted to batch 1 and the
        batch axis squeezed from the result.

        Packet-loss concealment: ``lost`` may flag frames — (frames,) or
        (batch, frames) of 0/1 — whose codes were not received; they are
        reconstructed from the BVRNN's own prior ``P(z_t | h_t)`` (the
        entropy model the reference trains, ``bvrnn.py:148-156``, here
        doubling as the PLC model).  ``conceal_mode``: ``'expect'``
        (default; substitute the prior probabilities — better and
        numerically stable, see ``models.bvrnn.decode_plc``) or ``'map'``
        (rounded bits).  ``conceal_bitrate``: optional bps (scalar or
        per-frame, like ``encode``) to mask concealed frames to the
        stream's real allocation; None uses all ``z_dim`` bits."""
        codes = _as_device_array(codes, jnp.float32)
        squeeze = codes.ndim == 2
        if squeeze:
            codes = codes[None]
        if codes.ndim != 3:
            raise ValueError(
                "decode expects (batch, frames, z_dim) or (frames, z_dim) "
                f"codes, got shape {codes.shape}"
            )
        T = codes.shape[1]
        hop = self.conf.hopsize
        # one bucket covers both the code frames and the requested length so
        # the causal vocoder always has enough frames to synthesise `length`
        padded_len = self._pad_length(max(T * hop, length))
        Tp = padded_len // hop
        codes = jnp.pad(codes, ((0, 0), (0, Tp - T), (0, 0)), constant_values=0.5)
        if lost is not None:
            lost = np.asarray(lost, np.float32)
            if lost.ndim == 1:
                lost = lost[None, :]
            if lost.shape != (codes.shape[0], T):
                raise ValueError(
                    f"lost mask shape {lost.shape} != ({codes.shape[0]}, {T})"
                )
            lost = np.pad(lost, ((0, 0), (0, Tp - T)))  # padding frames: received
            cbits = None
            if conceal_bitrate is not None:
                cb = np.broadcast_to(
                    np.asarray(self.bits_per_frame(conceal_bitrate), np.float32),
                    (codes.shape[0], T),
                )
                cbits = np.pad(cb, ((0, 0), (0, Tp - T)))
            y = self._decode_plc_jit(
                self.bvrnn_params,
                self.vocoder_params,
                codes,
                jnp.asarray(lost),
                None if cbits is None else jnp.asarray(cbits),
                self._voc_kernel_blocks,
                vcfg=self.conf.vocoder_config,
                length=padded_len,
                mode=conceal_mode,
                pallas_compute=(
                    "bf16" if self.precision == jax.lax.Precision.DEFAULT
                    else "f32"
                ),
                approx_snake=self.approx_snake,
                voc_dtype=self.voc_dtype,
            )
        else:
            y = self._decode_jit(
                self.bvrnn_params,
                self.vocoder_params,
                codes,
                self._voc_kernel_blocks,
                vcfg=self.conf.vocoder_config,
                length=padded_len,
                pallas_compute=(
                    "bf16" if self.precision == jax.lax.Precision.DEFAULT else "f32"
                ),
                approx_snake=self.approx_snake,
                voc_dtype=self.voc_dtype,
            )
        y = y[:, :length]
        return y[0] if squeeze else y

    def decode_to_mel(self, codes) -> jax.Array:
        """codes: (batch, frames, z_dim) -> decoded log-mel (batch, num_mels,
        frames) — the mel the vocoder consumes (scaled domain; the −10 dB
        SCALING is applied before the mel at encode and undone after the
        vocoder).  This is the tensor the reference fine-tunes its vocoder on
        (ckpt ``ftbvrnn``; reference ``meldataset.py:197-214`` consumes the
        dumps).  2-D codes are auto-promoted/squeezed like :meth:`decode`."""
        codes = _as_device_array(codes, jnp.float32)
        squeeze = codes.ndim == 2
        if squeeze:
            codes = codes[None]
        T = codes.shape[1]
        Tp = self._pad_length(T * self.conf.hopsize) // self.conf.hopsize
        codes_p = jnp.pad(codes, ((0, 0), (0, Tp - T), (0, 0)), constant_values=0.5)
        mel = self._decode_mel_jit(self.bvrnn_params, codes_p)[..., :T]
        return mel[0] if squeeze else mel

    def __call__(self, x, bitrate, *, fused: bool = True) -> jax.Array:
        """One-shot encode+decode (reference ``bvrnn_codec_model.py:73-76``).

        By default this runs the FUSED resynthesis program: the BVRNN encode
        scan already computes the decoded-mel trajectory as part of its
        closed-loop state sync (reference ``bvrnn.py:204-206`` == ``:226-227``),
        so one program does mel -> encode scan -> vocoder with no separate
        decode scan or extra dispatch.  Codes are bit-identical to the
        two-program path, and the decoded-mel trajectory is too: every
        decode path computes phi_z per step in the same (B, z) shape as the
        encoder's state sync (``models.bvrnn.decode`` — a hoisted phi_z
        would diverge chaotically on trained models), measured bitwise-equal
        on the full-size demo checkpoint (and to ~1e-7 where XLA fuses the
        two programs differently; tested in test_codec/test_bvrnn).  Pass
        ``fused=False`` to run the two-program composition instead."""
        length = np.asarray(x).shape[-1]
        if not fused:
            return self.decode(self.encode(x, bitrate), length)
        x = _as_device_array(x, jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        if x.ndim != 2:
            raise ValueError(
                f"expected (batch, length) or (length,) waveform, got shape {x.shape}"
            )
        L = x.shape[1]
        Lp = self._pad_length(L)
        x = jnp.pad(x, ((0, 0), (0, Lp - L)))
        n_frames = self.frontend.num_frames(L)
        y = self._forward_jit(
            self.bvrnn_params,
            self.vocoder_params,
            x,
            jnp.asarray(
                self._frame_bits(bitrate, x.shape[0], L, Lp, n_frames),
                jnp.float32,
            ),
            jnp.asarray(n_frames, jnp.int32),
            self._voc_kernel_blocks,
            frontend=self.frontend,
            vcfg=self.conf.vocoder_config,
            length=Lp,
            pallas_compute=(
                "bf16" if self.precision == jax.lax.Precision.DEFAULT else "f32"
            ),
            approx_snake=self.approx_snake,
            voc_dtype=self.voc_dtype,
        )
        y = y[:, :length]
        return y[0] if squeeze else y

    forward = __call__


def _as_device_array(x, dtype) -> jax.Array:
    """Convert host inputs (numpy/torch/lists) without round-tripping arrays
    that already live on device."""
    if isinstance(x, jax.Array):
        return x.astype(dtype) if x.dtype != dtype else x
    return jnp.asarray(np.asarray(x), dtype)


# ---------------------------------------------------------------------------
# jitted implementations (pure functions of pytrees + static configs)
# ---------------------------------------------------------------------------


def _encode_impl(params, x, bits_per_frame, *, cfg, frontend):
    mel = frontend(x * SCALING)  # (B, M, T)
    mel = jnp.swapaxes(mel, 1, 2)  # (B, T, M)
    B, T, _ = mel.shape
    bits = jnp.broadcast_to(bits_per_frame, (B, T))
    h0 = jnp.zeros((B, cfg.h_dim), cfg.dtype)
    codes, _ = bvrnn_mod.encode_with_state(params, cfg, mel, bits, h0)
    return codes


def _forward_impl(
    params, voc_params, x, bits_per_frame, n_frames, kernel_blocks=None, *,
    bcfg, vcfg, frontend, length, pallas_compute="bf16", approx_snake=False,
    voc_dtype="f32",
):
    """Fused resynthesis: mel -> encode_decode scan -> vocoder, one program.

    ``n_frames`` (traced) marks the frames produced by the unpadded input;
    later frames (bucket padding) are forced to 0.5-codes inside the scan so
    the decoded trajectory matches the two-program path exactly (``decode``
    0.5-pads trimmed codes the same way)."""
    mel = frontend(x * SCALING)  # (B, M, T)
    mel = jnp.swapaxes(mel, 1, 2)  # (B, T, M)
    B, T, _ = mel.shape
    bits = jnp.broadcast_to(bits_per_frame, (B, T))
    valid = (jnp.arange(T)[None, :] < n_frames).astype(bcfg.dtype)
    valid = jnp.broadcast_to(valid, (B, T))
    h0 = jnp.zeros((B, bcfg.h_dim), bcfg.dtype)
    _, dec_mel, _ = bvrnn_mod.encode_decode(
        params, bcfg, mel, bits, h0, frame_valid=valid
    )
    dec_mel = jnp.swapaxes(dec_mel, 1, 2)  # (B, M, T)
    if kernel_blocks is not None:
        wav = voc_mod.generator_apply_pallas(
            voc_params, kernel_blocks, vcfg, dec_mel, length,
            precision=bcfg.precision,
            compute_dtype=(
                jnp.bfloat16 if pallas_compute == "bf16" else jnp.float32
            ),
        )
    else:
        wav = _voc_apply(voc_params, vcfg, dec_mel, length,
                         precision=bcfg.precision,
                         approx_snake=approx_snake, voc_dtype=voc_dtype)
    return wav[:, 0, :].astype(jnp.float32) / SCALING


def _voc_cast(voc_params, mel, voc_dtype):
    """Cast the vocoder segment to bf16 for the fast serving path (the
    BVRNN scans and their codes are untouched; waveform is cast back to
    f32 by the caller).  The in-jit weight cast is one fused ~0.2 ms
    convert pass — negligible against the ~42 ms generator."""
    if voc_dtype == "bf16":
        return (
            jax.tree.map(lambda a: a.astype(jnp.bfloat16), voc_params),
            mel.astype(jnp.bfloat16),
        )
    return voc_params, mel


# XLA's conv lowering for the offline generator is pathological at mid
# batch: at B in [8, 96) the compiled program moves 3-6x the bytes of the
# B>=96 program (measured 55-122 ms vs ~42 ms for the 4 s serving shape;
# benchmarks/probe_b64_cliff.py + the r5 edge sweep — B<=4 is healthy at
# 12-17 ms).  Padding the mel batch to 96 inside the program and slicing
# the output recovers the full loss (2.35x at B=32, 2.87x at B=64,
# probe_voc_int8_segment.py [B]).  Streaming/engine ticks use
# generator_stream_step and are unaffected.
VOC_BATCH_PAD_LO = 8
VOC_BATCH_PAD_TO = 96


def _voc_apply(voc_params, vcfg, mel, length, *, precision, approx_snake,
               voc_dtype):
    """generator_apply with the fast-path cast + batch bucketing above."""
    voc_params, mel = _voc_cast(voc_params, mel, voc_dtype)
    B = mel.shape[0]
    # symbolic batch dims (jax.export shape polymorphism) skip the padding
    # policy — the comparison below would be inconclusive for them, and a
    # symbolic-batch program must stay batch-generic anyway
    if isinstance(B, int) and VOC_BATCH_PAD_LO <= B < VOC_BATCH_PAD_TO:
        mel = jnp.pad(mel, ((0, VOC_BATCH_PAD_TO - B), (0, 0), (0, 0)))
        wav = voc_mod.generator_apply(
            voc_params, vcfg, mel, length, precision=precision,
            approx_snake=approx_snake,
        )
        return wav[:B]
    return voc_mod.generator_apply(
        voc_params, vcfg, mel, length, precision=precision,
        approx_snake=approx_snake,
    )


def _decode_mel_impl(params, codes, *, cfg):
    """BVRNN decode only: codes (B, T, z) -> log-mel (B, M, T)."""
    B = codes.shape[0]
    h0 = jnp.zeros((B, cfg.h_dim), cfg.dtype)
    mel, _ = bvrnn_mod.decode(params, cfg, codes, h0)
    return jnp.swapaxes(mel, 1, 2)


def _decode_plc_impl(
    params, voc_params, codes, lost, conceal_bits, kernel_blocks=None, *,
    bcfg, vcfg, length, mode="expect", pallas_compute="bf16", approx_snake=False,
    voc_dtype="f32",
):
    """Decode with prior-based packet-loss concealment (models.bvrnn.decode_plc)."""
    B = codes.shape[0]
    h0 = jnp.zeros((B, bcfg.h_dim), bcfg.dtype)
    mel, _ = bvrnn_mod.decode_plc(
        params, bcfg, codes, lost, h0, conceal_bits, mode=mode
    )
    mel = jnp.swapaxes(mel, 1, 2)
    if kernel_blocks is not None:
        wav = voc_mod.generator_apply_pallas(
            voc_params, kernel_blocks, vcfg, mel, length,
            precision=bcfg.precision,
            compute_dtype=(
                jnp.bfloat16 if pallas_compute == "bf16" else jnp.float32
            ),
        )
    else:
        wav = _voc_apply(voc_params, vcfg, mel, length,
                         precision=bcfg.precision,
                         approx_snake=approx_snake, voc_dtype=voc_dtype)
    return wav[:, 0, :].astype(jnp.float32) / SCALING


def _decode_impl(
    params, voc_params, codes, kernel_blocks=None, *, bcfg, vcfg, length,
    pallas_compute="bf16", approx_snake=False, voc_dtype="f32",
):
    B = codes.shape[0]
    h0 = jnp.zeros((B, bcfg.h_dim), bcfg.dtype)
    mel, _ = bvrnn_mod.decode(params, bcfg, codes, h0)
    mel = jnp.swapaxes(mel, 1, 2)
    if kernel_blocks is not None:
        wav = voc_mod.generator_apply_pallas(
            voc_params, kernel_blocks, vcfg, mel, length,
            precision=bcfg.precision,
            compute_dtype=(
                jnp.bfloat16 if pallas_compute == "bf16" else jnp.float32
            ),
        )
    else:
        wav = _voc_apply(voc_params, vcfg, mel, length,
                         precision=bcfg.precision,
                         approx_snake=approx_snake, voc_dtype=voc_dtype)
    return wav[:, 0, :].astype(jnp.float32) / SCALING


# ---------------------------------------------------------------------------
# checkpoint loading
# ---------------------------------------------------------------------------


def _unflatten_npz(z, dtype):
    """Rebuild a params pytree from a flat ``a/0/b``-keyed npz (the demo
    checkpoint format written by chkpts/ tooling).  All-integer key levels
    become lists."""
    tree: dict = {}
    for key in z.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(z[key]), dtype)

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[k]) for k in sorted(node, key=int)]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def _load_bvrnn_checkpoint(path: str, dtype):
    from bvsc_tpu.convert import bvrnn_params_from_torch, load_torch_checkpoint

    if path.endswith(".npz"):  # flat demo artifact (chkpts/*.npz)
        return _unflatten_npz(np.load(path), dtype)
    if os.path.isdir(path):  # Orbax directory
        from bvsc_tpu.train.checkpoint import restore_pytree

        tree = restore_pytree(path)
        if isinstance(tree, dict) and "vrnn" in tree:
            return tree["vrnn"]
        if isinstance(tree, dict) and "params" in tree:  # TrainState save
            return tree["params"]
        if isinstance(tree, (list, tuple)):
            # targetless Orbax restore of a registered-pytree TrainState
            # flattens to its children [params, opt_state, step]
            for child in tree:
                if isinstance(child, dict) and "gru" in child and "phi_x" in child:
                    return child
            raise ValueError(
                f"unrecognized BVRNN checkpoint structure at {path}: restored "
                "a sequence with no child carrying 'gru'/'phi_x' params"
            )
        return tree
    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("vrnn", ckpt)  # reference schema {'vrnn': state_dict}
    return bvrnn_params_from_torch(sd, dtype=dtype)


def _load_vocoder_checkpoint(path: str, vcfg, dtype):
    from bvsc_tpu.convert import load_torch_checkpoint, vocoder_params_from_torch

    if os.path.isdir(path):
        from bvsc_tpu.models.vocoder import fold_generator_params
        from bvsc_tpu.train.checkpoint import restore_pytree

        tree = restore_pytree(path)
        if isinstance(tree, dict) and "generator" in tree:
            tree = tree["generator"]
        elif isinstance(tree, (list, tuple)):
            # targetless restore of GANTrainState -> [gen, mpd, mrd, ...]
            for child in tree:
                if isinstance(child, dict) and "conv_pre" in child:
                    tree = child
                    break
            else:
                raise ValueError(
                    f"unrecognized vocoder checkpoint structure at {path}: "
                    "restored a sequence with no child carrying 'conv_pre'"
                )
        # trainer checkpoints carry weight-norm (g, v) params; fold for
        # inference (reference inference.py:53 remove_weight_norm)
        if isinstance(tree, dict) and "conv_pre" in tree and "g" in tree["conv_pre"]:
            tree = fold_generator_params(tree)
        return tree
    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("generator", ckpt)  # reference schema (train.py:326-337)
    return vocoder_params_from_torch(sd, vcfg)
