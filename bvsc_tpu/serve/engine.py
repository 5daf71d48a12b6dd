"""Batched multi-stream serving engine.

Serves up to ``max_streams`` concurrent full-duplex codec sessions on one
chip (the BASELINE.json serving config: 128 concurrent streams with
per-stream bitrates).  The reference has no serving layer (SURVEY §1 "no
serving layer"); this is the TPU-native design for one:

  * every stream owns a slot in fixed-shape batched state (BVRNN hidden
    states + streaming-vocoder conv buffers),
  * a ``tick()`` advances ALL active streams by one 256-sample frame in two
    jitted XLA calls (encode-side, decode-side), with inactive slots masked
    so shapes never change and nothing recompiles,
  * per-stream bitrate is a (B,)-vector — the bit-priority mask already
    supports per-frame bits (models/bvrnn.py bit_mask_from_bitrate),
  * opening/closing a stream zeroes its state rows on device.

Host-side per-slot sample/code queues are plain numpy ring buffers; all
heavy compute is batched on the MXU.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bvsc_tpu.codec import SCALING, BVRNNCodecModel
from bvsc_tpu.models import bvrnn as bvrnn_mod
from bvsc_tpu.ops.mel import dynamic_range_compression
from bvsc_tpu.streaming import generator_stream_init, generator_stream_step

WIN = 1024


@functools.partial(jax.jit, static_argnames=("bcfg", "frontend"))
def _encode_tick(params, window, h, bits, active, *, bcfg, frontend):
    """window: (B, 1024) current frame samples; one encode step."""
    frames = window * SCALING * frontend.window
    cos_b, sin_b = frontend._dft
    re = jnp.matmul(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im + 1e-9)  # (B, bins)
    mel = dynamic_range_compression(mag @ frontend.mel_basis.T)  # (B, M)
    codes, h_new = bvrnn_mod.encode_with_state(
        params, bcfg, mel[:, None, :], bits[:, None], h
    )
    h = jnp.where(active[:, None], h_new, h)
    return codes[:, 0, :], h


@functools.partial(jax.jit, static_argnames=("bcfg", "vcfg"))
def _decode_tick(params, voc_params, codes, dec_h, voc_state, active, *, bcfg, vcfg):
    mel, h_new = bvrnn_mod.decode(params, bcfg, codes[:, None, :], dec_h)
    new_voc, wav = generator_stream_step(
        voc_params, vcfg, voc_state, jnp.swapaxes(mel, 1, 2)
    )
    dec_h = jnp.where(active[:, None], h_new, dec_h)
    mask = active[:, None]
    voc_state = jax.tree.map(
        lambda new, old: jnp.where(
            mask[..., None] if new.ndim == 3 else mask, new, old
        ),
        new_voc, voc_state,
    )
    return wav[:, 0, :] / SCALING, dec_h, voc_state


class ServingEngine:
    def __init__(self, codec: BVRNNCodecModel, max_streams: int = 128, mesh=None):
        """mesh: optional jax.sharding.Mesh — shards the stream batch over
        the mesh's data axis (multi-chip serving over ICI; params replicated
        by jit's sharding propagation)."""
        self.codec = codec
        conf = codec.conf
        self.B = max_streams
        self.hop = conf.hopsize
        self.pad_left = conf.mel_pad_left
        self.z_dim = conf.z_dim
        dtype = codec.bvrnn_cfg.dtype

        self.enc_h = jnp.zeros((self.B, conf.h_dim), dtype)
        self.dec_h = jnp.zeros((self.B, conf.h_dim), dtype)
        self.voc_state = generator_stream_init(conf.vocoder_config, self.B, dtype)
        self._batch_sharding = None
        if mesh is not None:
            from bvsc_tpu.parallel.mesh import batch_sharded

            if self.B % mesh.size:
                raise ValueError("max_streams must divide evenly over the mesh")
            self._batch_sharding = batch_sharded(mesh)
            put = lambda t: jax.device_put(t, self._batch_sharding)
            self.enc_h = put(self.enc_h)
            self.dec_h = put(self.dec_h)
            self.voc_state = jax.tree.map(put, self.voc_state)
        self.bits = np.zeros(self.B, np.float32)

        self._free = list(range(max_streams))
        self._active = np.zeros(self.B, bool)
        self._started = np.zeros(self.B, bool)
        # per-slot host queues
        self._inq = [np.zeros(0, np.float32) for _ in range(self.B)]
        self._win = np.zeros((self.B, WIN), np.float32)  # rolling mel windows

        self._frontend = codec.frontend
        self._bcfg = codec.bvrnn_cfg
        self._vcfg = conf.vocoder_config

    # -- stream management ----------------------------------------------------

    def open_stream(self, bitrate: float) -> int:
        if not self._free:
            raise RuntimeError("no free stream slots")
        sid = self._free.pop(0)
        self._active[sid] = True
        self._started[sid] = False
        self._inq[sid] = np.zeros(0, np.float32)
        self._win[sid] = 0.0
        self.bits[sid] = self.codec.bits_per_frame(bitrate)
        # zero the slot's device state rows
        self.enc_h = self.enc_h.at[sid].set(0.0)
        self.dec_h = self.dec_h.at[sid].set(0.0)
        self.voc_state = jax.tree.map(
            lambda s: s.at[sid].set(0.0), self.voc_state
        )
        return sid

    def close_stream(self, sid: int) -> None:
        assert self._active[sid]
        self._active[sid] = False
        self._free.append(sid)

    def set_bitrate(self, sid: int, bitrate: float) -> None:
        """Mid-stream bitrate switch (the codec is bitrate-scalable)."""
        self.bits[sid] = self.codec.bits_per_frame(bitrate)

    def push(self, sid: int, samples: np.ndarray) -> None:
        self._inq[sid] = np.concatenate([self._inq[sid], np.asarray(samples, np.float32)])

    # -- processing -----------------------------------------------------------

    def tick(self) -> dict[int, tuple[np.ndarray, np.ndarray]]:
        """Advance every stream with a full frame queued by one frame.

        Returns {sid: (codes (z_dim,), wav (hop,))} for advanced streams.
        """
        advanced = []
        for sid in range(self.B):
            if not self._active[sid]:
                continue
            if not self._started[sid]:
                need = WIN - self.pad_left  # 768: lookahead + first hop
                if self._inq[sid].shape[0] < need:
                    continue
                x = self._inq[sid][:need]
                pre = x[1 : self.pad_left + 1][::-1]  # reflect pre-roll
                self._win[sid] = np.concatenate([pre, x])
                self._inq[sid] = self._inq[sid][need:]
                self._started[sid] = True
                advanced.append(sid)
            else:
                if self._inq[sid].shape[0] < self.hop:
                    continue
                self._win[sid] = np.concatenate(
                    [self._win[sid][self.hop :], self._inq[sid][: self.hop]]
                )
                self._inq[sid] = self._inq[sid][self.hop :]
                advanced.append(sid)

        if not advanced:
            return {}
        active = np.zeros(self.B, bool)
        active[advanced] = True
        if self._batch_sharding is not None:
            win = jax.device_put(jnp.asarray(self._win), self._batch_sharding)
            act = jax.device_put(jnp.asarray(active), self._batch_sharding)
            codes, self.enc_h = _encode_tick(
                self.codec.bvrnn_params, win, self.enc_h,
                jax.device_put(jnp.asarray(self.bits), self._batch_sharding), act,
                bcfg=self._bcfg, frontend=self._frontend,
            )
            wav, self.dec_h, self.voc_state = _decode_tick(
                self.codec.bvrnn_params, self.codec.vocoder_params, codes,
                self.dec_h, self.voc_state, act,
                bcfg=self._bcfg, vcfg=self._vcfg,
            )
            codes_np = np.asarray(codes)
            wav_np = np.asarray(wav)
            return {sid: (codes_np[sid], wav_np[sid]) for sid in advanced}
        codes, self.enc_h = _encode_tick(
            self.codec.bvrnn_params, jnp.asarray(self._win),
            self.enc_h, jnp.asarray(self.bits), jnp.asarray(active),
            bcfg=self._bcfg, frontend=self._frontend,
        )
        wav, self.dec_h, self.voc_state = _decode_tick(
            self.codec.bvrnn_params, self.codec.vocoder_params, codes,
            self.dec_h, self.voc_state, jnp.asarray(active),
            bcfg=self._bcfg, vcfg=self._vcfg,
        )
        codes_np = np.asarray(codes)
        wav_np = np.asarray(wav)
        return {sid: (codes_np[sid], wav_np[sid]) for sid in advanced}
