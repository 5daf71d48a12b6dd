"""Batched multi-stream serving engine.

Serves up to ``max_streams`` concurrent full-duplex codec sessions on one
chip (the BASELINE.json serving config: 128 concurrent streams with
per-stream bitrates).  The reference has no serving layer (SURVEY §1 "no
serving layer"); this is the TPU-native design for one:

  * every stream owns a slot in fixed-shape batched device state: the
    rolling 1024-sample STFT window, BVRNN encoder/decoder hidden states,
    and the streaming-vocoder conv buffers ALL live on device — per tick
    only the new 256-sample hop per stream crosses the host boundary,
  * a ``tick()`` advances ALL active streams by one frame in ONE fused
    jitted XLA call (window roll -> mel -> BVRNN encode -> BVRNN decode ->
    streaming vocoder), with inactive slots masked so shapes never change
    and nothing recompiles,
  * per-stream bitrate is a (B,)-vector — the bit-priority mask already
    supports per-frame bits (models/bvrnn.py bit_mask_from_bitrate),
  * opening/closing a stream zeroes its state rows on device; a stream's
    first tick preloads its window row with the reflect pre-roll so the
    rolled-in hop reproduces the one-shot left padding exactly.

Host-side per-slot sample queues are plain numpy ring buffers; all heavy
compute is batched on the MXU.  One engine slot is bit-identical to a
dedicated ``StreamingCodec`` (tested).
"""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np

from bvsc_tpu.codec import SCALING, BVRNNCodecModel
from bvsc_tpu.models import bvrnn as bvrnn_mod
from bvsc_tpu.ops.mel import dynamic_range_compression
from bvsc_tpu.streaming import (
    generator_stream_init,
    generator_stream_step,
    voc_state_dtype,
)


class EngineStateLost(RuntimeError):
    """A tick failed after its donated device state was consumed.

    The tick programs donate the state pytree (``donate_argnums``), so an
    exception mid-dispatch can leave ``self.state`` referencing deleted
    buffers — retrying would then fail forever ("Array has been deleted"),
    a permanent livelock.  The engine rebuilds zeroed device state before
    raising this, so the engine object stays usable, but every stream's
    hidden state is gone: callers must close (and clients reopen) all
    active streams.  The BVSP daemon does exactly that.
    """


class _SampleQueue:
    """Chunked FIFO of float32 samples: O(1) amortized push/pop.

    A flat ``np.concatenate`` queue re-copies the entire backlog on every
    push — a client that sends a long recording up front (the documented
    send-then-CLOSE pattern) would make that O(n²) while holding the
    daemon's lock.  Chunks are only touched when popped.
    """

    __slots__ = ("_chunks", "_off", "_len")

    def __init__(self):
        self._chunks: collections.deque[np.ndarray] = collections.deque()
        self._off = 0  # consumed samples of the head chunk
        self._len = 0

    def __len__(self) -> int:
        return self._len

    def push(self, samples: np.ndarray) -> None:
        x = np.asarray(samples, np.float32).reshape(-1)
        if x.size:
            self._chunks.append(x)
            self._len += x.size

    def pop(self, n: int) -> np.ndarray:
        if n > self._len:
            raise ValueError(f"pop({n}) from a {self._len}-sample queue")
        out = np.empty(n, np.float32)
        got = 0
        while got < n:
            head = self._chunks[0]
            take = min(head.size - self._off, n - got)
            out[got : got + take] = head[self._off : self._off + take]
            got += take
            self._off += take
            if self._off == head.size:
                self._chunks.popleft()
                self._off = 0
        self._len -= n
        return out


def _fused_tick_impl(
    params, voc_params, state, chunk, bits, active, *, bcfg, vcfg, frontend,
    approx_snake=False, voc_dtype="f32",
):
    """ONE dispatch advancing every active slot by one 256-sample frame.

    state: {window (B, 1024), h (B, h_dim), voc (pytree)};
    chunk: (B, hop) new samples; active: (B,) bool mask.
    Returns (new_state, codes (B, z), wav (B, hop)).

    One GRU state serves both ends: the closed-loop state-sync invariant
    (reference ``bvrnn.py:204-206`` == ``:226-227``) makes the encoder and
    decoder hidden trajectories identical given the codes, so the fused
    ``encode_decode`` step computes codes AND the decoded mel in one pass —
    half the per-tick BVRNN matmuls of an encode step + decode step.
    """
    hop = chunk.shape[-1]
    window = jnp.concatenate([state["window"][:, hop:], chunk], axis=-1)

    frames = window * SCALING * frontend.window
    cos_b, sin_b = frontend._dft
    re = jnp.matmul(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im + 1e-9)  # (B, bins)
    mel = dynamic_range_compression(
        jnp.matmul(mag, frontend.mel_basis.T,
                   precision=jax.lax.Precision.HIGHEST)
    )  # (B, M) — HIGHEST like the one-shot mel, else TPU bf16 passes can
    # flip a near-0.5 code bit and break one-shot parity

    codes, mel_hat, h = bvrnn_mod.encode_decode(
        params, bcfg, mel[:, None, :], bits[:, None], state["h"]
    )
    # approx_snake / voc_dtype mirror the codec's offline serving knobs so a
    # precision='default' codec runs the SAME vocoder numerics per tick as
    # its one-shot decode (streaming.generator_stream_step docstring)
    voc_state, wav = generator_stream_step(
        voc_params, vcfg, state["voc"], jnp.swapaxes(mel_hat, 1, 2),
        precision=bcfg.precision, approx_snake=approx_snake,
        compute_dtype=jnp.bfloat16 if voc_dtype == "bf16" else None,
    )

    mask = active[:, None]
    new_state = {
        "window": jnp.where(mask, window, state["window"]),
        "h": jnp.where(mask, h, state["h"]),
        "voc": _merge_active(mask, voc_state, state["voc"]),
    }
    return new_state, codes[:, 0, :], wav[:, 0, :].astype(jnp.float32) / SCALING


_fused_tick = functools.partial(
    jax.jit,
    static_argnames=("bcfg", "vcfg", "frontend", "approx_snake", "voc_dtype"),
    donate_argnums=(2,),
)(_fused_tick_impl)


def _merge_active(mask, new_tree, old_tree):
    """Keep inactive slots' state rows untouched: where(active, new, old)
    over a vocoder-state pytree (leaves are (B, C, k) buffers or (B, n)
    carries)."""
    return jax.tree.map(
        lambda new, old: jnp.where(
            mask[..., None] if new.ndim == 3 else mask, new, old
        ),
        new_tree,
        old_tree,
    )


class ServingEngine:
    def __init__(self, codec: BVRNNCodecModel, max_streams: int = 128, mesh=None):
        """mesh: optional jax.sharding.Mesh — shards the stream batch over
        the mesh's data axis (multi-chip serving over ICI; params replicated
        by jit's sharding propagation)."""
        self.codec = codec
        conf = codec.conf
        self.B = max_streams
        self.hop = conf.hopsize
        self.win = conf.winsize
        self.pad_left = conf.mel_pad_left
        self.z_dim = conf.z_dim
        dtype = codec.bvrnn_cfg.dtype

        self._batch_sharding = None
        if mesh is not None:
            from bvsc_tpu.parallel.mesh import batch_sharded

            if self.B % mesh.size:
                raise ValueError("max_streams must divide evenly over the mesh")
            self._batch_sharding = batch_sharded(mesh)

        self._h_dim = conf.h_dim
        self._state_dtype = dtype
        self.state = self._init_device_state()
        self._init_host_slots()

        self._frontend = codec.frontend
        self._bcfg = codec.bvrnn_cfg
        self._vcfg = conf.vocoder_config

    def _init_device_state(self):
        """Fresh zeroed device state (also the recovery path after
        :class:`EngineStateLost`; the bundle-backed engine overrides this
        with its exported init program)."""
        return self._put(
            {
                "window": jnp.zeros((self.B, self.win), jnp.float32),
                "h": jnp.zeros((self.B, self._h_dim), self._state_dtype),
                "voc": generator_stream_init(
                    self.codec.conf.vocoder_config, self.B,
                    voc_state_dtype(self.codec),
                ),
            }
        )

    def _init_host_slots(self) -> None:
        """Host-side per-slot bookkeeping (shared with the bundle-backed
        engine, whose ``__init__`` has no live codec)."""
        self.bits = np.zeros(self.B, np.float32)
        self._free = list(range(self.B))
        self._active = np.zeros(self.B, bool)
        self._started = np.zeros(self.B, bool)
        # per-slot host input queues (device state holds everything else)
        self._inq = [_SampleQueue() for _ in range(self.B)]
        # last pad_right+1 raw input samples per slot — the reflect source
        # for the one-shot-equivalent tail at begin_flush (mirrors
        # streaming.FusedPacketCodec._tail)
        self._tail = [np.zeros(0, np.float32) for _ in range(self.B)]
        self._flushing = np.zeros(self.B, bool)

    def _tick_call(self, state, chunk, bits, active):
        """The one fused device program per tick (overridden by the AOT
        bundle-backed engine with a deserialized export)."""
        return _fused_tick(
            self.codec.bvrnn_params, self.codec.vocoder_params, state,
            chunk, bits, active,
            bcfg=self._bcfg, vcfg=self._vcfg, frontend=self._frontend,
            approx_snake=self.codec.approx_snake,
            voc_dtype=self.codec.voc_dtype,
        )

    def _put(self, tree):
        if self._batch_sharding is None:
            return tree
        return jax.tree.map(
            lambda t: jax.device_put(t, self._batch_sharding), tree
        )

    # -- stream management ----------------------------------------------------

    def open_stream(self, bitrate: float) -> int:
        if not self._free:
            raise RuntimeError("no free stream slots")
        sid = self._free.pop(0)
        self._active[sid] = True
        self._started[sid] = False
        self._inq[sid] = _SampleQueue()
        self._tail[sid] = np.zeros(0, np.float32)
        self._flushing[sid] = False
        self.bits[sid] = self.codec.bits_per_frame(bitrate)
        # zero the slot's device state rows
        self.state = self._put(
            jax.tree.map(lambda s: s.at[sid].set(0.0), self.state)
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
        if self._flushing[sid]:
            raise ValueError("stream is flushing (begin_flush); no more input")
        x = np.asarray(samples, np.float32).reshape(-1)
        pad_right = self.win - self.pad_left - self.hop
        self._tail[sid] = np.concatenate([self._tail[sid], x])[
            -(pad_right + 1) :
        ]
        self._inq[sid].push(x)

    def queued(self, sid: int) -> int:
        """Samples buffered but not yet consumed (host-side backlog)."""
        return len(self._inq[sid])

    def begin_flush(self, sid: int) -> bool:
        """End of input: append the one-shot right reflect padding so the
        remaining queue drains to the exact one-shot frame count — two
        further output frames past the last full real-input frame, as in
        ``streaming.FusedPacketCodec.flush`` (one-shot right padding:
        reference ``meldataset.py:72-81``).  No suppression bookkeeping is
        needed: for input length L the queue then holds exactly
        ``L + pad_right`` samples, and since the first tick consumes
        ``hop + pad_right`` the drained frame count is
        ``(L − hop)//hop + 1`` — the one-shot mel frame count — with the
        sub-hop remainder (< hop) left unconsumed, exactly the padding
        samples the one-shot's final window never reaches either.
        Returns False (no-op) when the stream can never produce a first
        frame (total input < winsize − pad_left): it then drains to
        nothing, like a one-shot call on an input too short to frame.
        """
        if self._flushing[sid]:
            return True
        if not self._started[sid] and len(self._inq[sid]) < (
            self.win - self.pad_left
        ):
            return False
        pad_right = self.win - self.pad_left - self.hop
        ext = self._tail[sid][-pad_right - 1 : -1][::-1]
        self._inq[sid].push(ext)
        self._flushing[sid] = True
        return True

    def has_frame(self, sid: int) -> bool:
        """Whether a tick() would advance this stream (a full frame —
        winsize − pad_left samples before the first output, hop after)."""
        if not self._active[sid]:
            return False
        need = (self.win - self.pad_left) if not self._started[sid] else self.hop
        return len(self._inq[sid]) >= need

    # -- processing -----------------------------------------------------------

    def tick(self) -> dict[int, tuple[np.ndarray, np.ndarray]]:
        """Advance every stream with a full frame queued by one frame.

        Returns {sid: (codes (z_dim,), wav (hop,))} for advanced streams.
        """
        advanced = []
        chunk = np.zeros((self.B, self.hop), np.float32)
        preload: list[tuple[int, np.ndarray]] = []
        need = self.win - self.pad_left  # 768 @ default config: lookahead + first hop
        for sid in range(self.B):
            if not self._active[sid]:
                continue
            if not self._started[sid]:
                if len(self._inq[sid]) < need:
                    continue
                x = self._inq[sid].pop(need)
                pre = x[1 : self.pad_left + 1][::-1]  # reflect pre-roll
                window0 = np.concatenate([pre, x])  # (winsize,)
                # preload the slot's window so rolling in the final hop
                # reproduces window0 exactly (one-shot left padding)
                preload.append(
                    (sid, np.concatenate([np.zeros(self.hop, np.float32),
                                          window0[: -self.hop]]))
                )
                chunk[sid] = window0[-self.hop :]
                self._started[sid] = True
                advanced.append(sid)
            else:
                if len(self._inq[sid]) < self.hop:
                    continue
                chunk[sid] = self._inq[sid].pop(self.hop)
                advanced.append(sid)

        if not advanced:
            return {}
        if preload:  # only on stream-start ticks
            sids = np.array([p[0] for p in preload])
            wins = np.stack([p[1] for p in preload])
            self.state = dict(
                self.state,
                window=self._put(self.state["window"].at[sids].set(wins)),
            )
        active = np.zeros(self.B, bool)
        active[advanced] = True
        dev = lambda t: (
            jax.device_put(jnp.asarray(t), self._batch_sharding)
            if self._batch_sharding is not None
            else jnp.asarray(t)
        )
        try:
            self.state, codes, wav = self._tick_call(
                self.state, dev(chunk), dev(self.bits), dev(active)
            )
        except Exception as e:
            # donated state may be gone — rebuild so the ENGINE survives,
            # then tell the caller every STREAM's state is lost
            self.state = self._init_device_state()
            self._started[:] = False
            raise EngineStateLost(
                "tick failed after its donated state was consumed; device "
                "state rebuilt — close and reopen all active streams"
            ) from e
        codes_np = np.asarray(codes)
        wav_np = np.asarray(wav)
        return {sid: (codes_np[sid], wav_np[sid]) for sid in advanced}


def _decode_tick_impl(params, voc_params, state, codes, lost, cbits, active, *,
                      bcfg, vcfg, approx_snake=False, voc_dtype="f32"):
    """ONE dispatch advancing every active decode-only slot by one frame.

    state: {h (B, h_dim), voc (pytree)}; codes: (B, z_dim); lost: (B,)
    0/1 flags selecting prior-based concealment (models.bvrnn.decode_plc);
    cbits: (B,) per-slot concealment bit allocation.
    Returns (new_state, wav (B, hop)).
    """
    mel, h = bvrnn_mod.decode_plc(
        params, bcfg, codes[:, None, :], lost[:, None], state["h"],
        cbits[:, None],
    )
    voc_state, wav = generator_stream_step(
        voc_params, vcfg, state["voc"], jnp.swapaxes(mel, 1, 2),
        precision=bcfg.precision, approx_snake=approx_snake,
        compute_dtype=jnp.bfloat16 if voc_dtype == "bf16" else None,
    )
    mask = active[:, None]
    new_state = {
        "h": jnp.where(mask, h, state["h"]),
        "voc": _merge_active(mask, voc_state, state["voc"]),
    }
    return new_state, wav[:, 0, :].astype(jnp.float32) / SCALING


_decode_tick = functools.partial(
    jax.jit, static_argnames=("bcfg", "vcfg", "approx_snake", "voc_dtype"),
    donate_argnums=(2,),
)(_decode_tick_impl)


class DecodeEngine:
    """Batched decode-only serving: code streams in, audio out.

    The receiver-side counterpart of :class:`ServingEngine` — e.g. a relay
    decoding many remote parties at once.  Every slot carries (BVRNN h,
    streaming-vocoder buffers) on device; ``tick()`` advances all slots
    with a queued frame in ONE fused dispatch.  Frames may be flagged lost
    (``push_lost`` / the ``lost`` argument of ``push``): they are concealed
    from the BVRNN's own prior with no output gap, per stream.  One slot is
    numerically identical to a dedicated ``StreamingDecoder`` (tested).
    """

    def __init__(self, codec: BVRNNCodecModel, max_streams: int = 128,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh — shards the stream batch over
        the mesh's data axis (multi-chip decode serving over ICI)."""
        self.codec = codec
        conf = codec.conf
        self.B = max_streams
        self.hop = conf.hopsize
        self.z_dim = conf.z_dim
        dtype = codec.bvrnn_cfg.dtype
        self._batch_sharding = None
        if mesh is not None:
            from bvsc_tpu.parallel.mesh import batch_sharded

            if self.B % mesh.size:
                raise ValueError("max_streams must divide evenly over the mesh")
            self._batch_sharding = batch_sharded(mesh)
        self._h_dim = conf.h_dim
        self._state_dtype = dtype
        self.state = self._init_device_state()
        self._init_host_slots()
        self._bcfg = codec.bvrnn_cfg
        self._vcfg = conf.vocoder_config

    def _init_device_state(self):
        """Fresh zeroed device state (recovery path after
        :class:`EngineStateLost`; overridden by the bundle-backed engine)."""
        return self._put(
            {
                "h": jnp.zeros((self.B, self._h_dim), self._state_dtype),
                "voc": generator_stream_init(
                    self.codec.conf.vocoder_config, self.B,
                    voc_state_dtype(self.codec),
                ),
            }
        )

    def _init_host_slots(self) -> None:
        """Host-side per-slot bookkeeping (shared with the bundle engine)."""
        self._free = list(range(self.B))
        self._active = np.zeros(self.B, bool)
        # per-slot host queues of (codes (z,), lost flag) frames
        self._inq: list[collections.deque] = [
            collections.deque() for _ in range(self.B)
        ]
        # conceal_bits == z_dim is identical to "all prior bits"
        self.cbits = np.full(self.B, float(self.z_dim), np.float32)

    def _tick_call(self, state, codes, lost, cbits, active):
        """One fused decode tick (overridden by the bundle-backed engine)."""
        return _decode_tick(
            self.codec.bvrnn_params, self.codec.vocoder_params, state,
            codes, lost, cbits, active, bcfg=self._bcfg, vcfg=self._vcfg,
            approx_snake=self.codec.approx_snake,
            voc_dtype=self.codec.voc_dtype,
        )

    def _put(self, tree):
        if self._batch_sharding is None:
            return tree
        return jax.tree.map(
            lambda t: jax.device_put(t, self._batch_sharding), tree
        )

    def open_stream(self, conceal_bitrate=None) -> int:
        """conceal_bitrate: bps masking this stream's PLC-concealed frames
        to its real allocation (the receiver knows it, e.g. from the .bvsc
        table); None conceals with all ``z_dim`` prior bits."""
        if not self._free:
            raise RuntimeError("no free stream slots")
        sid = self._free.pop(0)
        self._active[sid] = True
        self._inq[sid] = collections.deque()
        self.cbits[sid] = (
            float(self.z_dim) if conceal_bitrate is None
            else self.codec.bits_per_frame(conceal_bitrate)
        )
        self.state = self._put(
            jax.tree.map(lambda s: s.at[sid].set(0.0), self.state)
        )
        return sid

    def close_stream(self, sid: int) -> None:
        assert self._active[sid]
        self._active[sid] = False
        self._free.append(sid)

    def push(self, sid: int, codes: np.ndarray, lost=None) -> None:
        """Enqueue (n, z_dim) code frames; lost: optional (n,) 0/1 flags."""
        codes = np.asarray(codes, np.float32).reshape(-1, self.z_dim)
        lost = np.zeros(codes.shape[0]) if lost is None else np.asarray(lost)
        if lost.shape != (codes.shape[0],):
            raise ValueError(
                f"lost shape {lost.shape} != ({codes.shape[0]},)"
            )
        for frame, flag in zip(codes, lost):
            self._inq[sid].append((frame, bool(flag)))

    def queued(self, sid: int) -> int:
        """Code frames buffered but not yet decoded (host-side backlog)."""
        return len(self._inq[sid])

    def has_frame(self, sid: int) -> bool:
        """Whether a tick() would advance this stream (>=1 queued frame)."""
        return bool(self._active[sid]) and bool(self._inq[sid])

    def push_lost(self, sid: int, n: int = 1) -> None:
        """Enqueue n never-arrived frames (concealed at tick)."""
        neutral = np.full(self.z_dim, 0.5, np.float32)
        for _ in range(n):
            self._inq[sid].append((neutral, True))

    def tick(self) -> dict[int, np.ndarray]:
        """Advance every stream with a queued frame; {sid: wav (hop,)}."""
        advanced = [
            sid for sid in range(self.B)
            if self._active[sid] and self._inq[sid]
        ]
        if not advanced:
            return {}
        codes = np.full((self.B, self.z_dim), 0.5, np.float32)
        lost = np.zeros(self.B, np.float32)
        for sid in advanced:
            frame, flag = self._inq[sid].popleft()
            codes[sid] = frame
            lost[sid] = float(flag)
        active = np.zeros(self.B, bool)
        active[advanced] = True
        dev = lambda t: (
            jax.device_put(jnp.asarray(t), self._batch_sharding)
            if self._batch_sharding is not None
            else jnp.asarray(t)
        )
        try:
            self.state, wav = self._tick_call(
                self.state, dev(codes), dev(lost), dev(self.cbits), dev(active)
            )
        except Exception as e:
            self.state = self._init_device_state()
            raise EngineStateLost(
                "decode tick failed after its donated state was consumed; "
                "device state rebuilt — close and reopen all active streams"
            ) from e
        wav_np = np.asarray(wav)
        return {sid: wav_np[sid] for sid in advanced}
