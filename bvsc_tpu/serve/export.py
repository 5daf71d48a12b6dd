"""AOT serving bundles: the codec's jitted programs serialized to portable
StableHLO artifacts (``jax.export``).

The reference's only deployment story is "load the torch checkpoints and run
the Python model code" (``bvrnn_codec_model.py:38-42``).  The TPU-native
equivalent of a deployable inference engine is an *exported program set*:
each serving entry point is traced once, lowered to StableHLO for explicit
target platforms (CPU **and** TPU from one artifact), and serialized together
with the weights into a single ``.bvscx`` zip.  Serving hosts reload it with
:class:`ServingBundle` — no model-definition code, converter, or config
parsing runs at serve time, and the program is byte-identical to what was
validated at export time.

Bundle contents (``meta.json`` is the manifest):
  * batched one-shot programs per length bucket — ``encode`` / ``decode`` /
    ``forward`` (the fused mel -> BVRNN ``encode_decode`` scan -> vocoder
    resynthesis program, see ``codec._forward_impl``),
  * the real-time packet programs — sender side ``packet_step``
    (``streaming._fused_packet_step``: one dispatch per 11.6 ms packet) +
    ``packet_init``, and receiver side ``packet_decode_step`` (streaming
    decode with prior-based packet-loss concealment) + ``packet_decode_init``,
  * the parameter pytrees as flat-keyed npz (weights are NOT baked into the
    programs as constants, so one artifact stays small and the same programs
    could be re-issued with refreshed weights).

Wire format note: programs embed the export-time *shapes* (batch, length
buckets) — serving picks the smallest covering bucket, mirroring
``BVRNNCodecModel``'s own jit bucketing.
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
import zipfile
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bvsc_tpu.config import CodecConfig
from bvsc_tpu.serve.engine import DecodeEngine, ServingEngine
from bvsc_tpu.streaming import FusedPacketCodec, voc_compute_dtype, voc_state_dtype

FORMAT = "bvsc-serve-1"


# ---------------------------------------------------------------------------
# pytree <-> flat npz (dtype-preserving; same key scheme as chkpts/*.npz)
# ---------------------------------------------------------------------------


def _flatten_tree(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_tree(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten_tree(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], np.asarray(tree)


def _unflatten_npz(z) -> Any:
    """Inverse of :func:`_flatten_tree` (dtype-preserving — quantized int8
    weights and their f32 scales coexist in one tree)."""
    tree: dict = {}
    for key in z.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(z[key]))

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[k]) for k in sorted(node, key=int)]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def _tree_specs(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), tree
    )


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------


def export_serving_bundle(
    codec,
    path: str,
    *,
    batch: int | None = 1,
    lengths: tuple[int, ...] = (2 ** 16,),
    packet: bool = True,
    engine_batch: int | None = None,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
) -> dict:
    """Export ``codec`` (a :class:`bvsc_tpu.codec.BVRNNCodecModel`) to a
    ``.bvscx`` serving bundle at ``path``.  Returns the manifest dict.

    ``lengths`` are requested sample counts; each is rounded up to the
    codec's jit length bucket and becomes one exported program triple.
    ``platforms`` lowers every program for each listed backend — export on
    this CPU host, serve on TPU.

    ``batch=None`` exports the one-shot programs with a *symbolic* batch
    dimension (jax.export shape polymorphism): one serialized program
    serves any request batch size.  The packet programs keep a concrete
    batch of 1 in that mode (live sessions are fixed device slots).

    ``engine_batch=N`` additionally exports the batched multi-stream
    serving-engine tick programs (the active-masked full-duplex tick of
    :class:`bvsc_tpu.serve.engine.ServingEngine` and the decode-with-PLC
    tick of :class:`~bvsc_tpu.serve.engine.DecodeEngine`) at N stream
    slots — :class:`BundleServingEngine` / :class:`BundleDecodeEngine`
    (and through them the BVSP daemon, ``scripts/serve_daemon.py
    --bundle``) then serve N concurrent network streams from the artifact
    alone.
    """
    from bvsc_tpu.codec import _decode_impl, _encode_impl, _forward_impl

    conf: CodecConfig = codec.conf
    bcfg, vcfg, frontend = codec.bvrnn_cfg, codec.conf.vocoder_config, codec.frontend
    pspec = _tree_specs(codec.bvrnn_params)
    vspec = _tree_specs(codec.vocoder_params)
    f32 = jnp.float32
    if batch is None:
        (B,) = jax.export.symbolic_shape("b", scope=jax.export.SymbolicScope())
        packet_batch = 1
    else:
        B = packet_batch = batch

    def _export(fn, *specs):
        exp = jax.export.export(jax.jit(fn), platforms=list(platforms))(*specs)
        return exp.serialize()

    blobs: dict[str, bytes] = {}
    buckets = []
    seen = set()
    for length in sorted(int(x) for x in lengths):
        Lp = codec._pad_length(length)
        if Lp in seen:
            continue
        seen.add(Lp)
        Tp = frontend.num_frames(Lp)
        xs = jax.ShapeDtypeStruct((B, Lp), f32)
        bs = jax.ShapeDtypeStruct((B, Tp), f32)
        cs = jax.ShapeDtypeStruct((B, Tp, conf.z_dim), f32)
        ns = jax.ShapeDtypeStruct((), jnp.int32)

        def enc_fn(p, x, bits):
            return _encode_impl(p, x, bits, cfg=bcfg, frontend=frontend)

        def dec_fn(p, vp, codes, Lp=Lp):
            return _decode_impl(p, vp, codes, None, bcfg=bcfg, vcfg=vcfg,
                                length=Lp, pallas_compute="f32",
                                approx_snake=codec.approx_snake,
                                voc_dtype=codec.voc_dtype)

        def fwd_fn(p, vp, x, bits, n_frames, Lp=Lp):
            return _forward_impl(p, vp, x, bits, n_frames, None, bcfg=bcfg,
                                 vcfg=vcfg, frontend=frontend, length=Lp,
                                 pallas_compute="f32",
                                 approx_snake=codec.approx_snake,
                                 voc_dtype=codec.voc_dtype)

        def voc_fn(vp, mel, Lp=Lp):
            # standalone mel -> waveform (scripts/synthesize.py semantics:
            # no codec -10 dB scaling; reference inference_e2e.py:53-62).
            # voc_dtype is applied like decode/forward so every program in
            # one bundle runs the same vocoder numerics.
            from bvsc_tpu.codec import _voc_cast
            from bvsc_tpu.models import vocoder as voc_mod

            vp, mel = _voc_cast(vp, mel, codec.voc_dtype)
            return voc_mod.generator_apply(
                vp, vcfg, mel, Lp, precision=bcfg.precision,
                approx_snake=codec.approx_snake,
            )[:, 0, :].astype(jnp.float32)

        ms = jax.ShapeDtypeStruct((B, conf.num_mels, Tp), f32)
        names = {}
        for name, fn, specs in (
            ("encode", enc_fn, (pspec, xs, bs)),
            ("decode", dec_fn, (pspec, vspec, cs)),
            ("forward", fwd_fn, (pspec, vspec, xs, bs, ns)),
            ("vocode", voc_fn, (vspec, ms)),
        ):
            blob_name = f"programs/{name}_{Lp}.shlo"
            blobs[blob_name] = _export(fn, *specs)
            names[name] = blob_name
        buckets.append({"length": Lp, "frames": Tp, "programs": names})

    packet_meta = None
    vsdt = voc_state_dtype(codec)
    if packet:
        from bvsc_tpu.streaming import _fused_packet_step, generator_stream_init

        state0 = {
            "window": jnp.zeros((packet_batch, conf.winsize), f32),
            "h": jnp.zeros((packet_batch, conf.h_dim), bcfg.dtype),
            "voc": generator_stream_init(vcfg, packet_batch, vsdt),
        }

        def step_fn(p, vp, state, chunk, bits):
            return _fused_packet_step(p, vp, state, chunk, bits,
                                      bcfg=bcfg, vcfg=vcfg, frontend=frontend,
                                      approx_snake=codec.approx_snake,
                                      voc_dtype=codec.voc_dtype)

        blobs["programs/packet_step.shlo"] = _export(
            step_fn, pspec, vspec, _tree_specs(state0),
            jax.ShapeDtypeStruct((packet_batch, conf.hopsize), f32),
            jax.ShapeDtypeStruct((packet_batch,), f32),
        )
        blobs["programs/packet_init.shlo"] = _export(lambda: state0)

        # receiver-side streaming program: one code frame -> hop samples,
        # with prior-based packet-loss concealment for frames flagged lost
        # (lost == 0 runs the mathematically identical path to a plain
        # decode — the PLC scan hoists phi_z of the received codes exactly
        # like decode(), see models.bvrnn.decode_plc; the reloaded export
        # may still compile to differently-reassociated kernels, so expect
        # float-precision agreement with a live decoder, ~1e-5 at full
        # scale).  A standalone receiver needs nothing but the bundle.
        from bvsc_tpu.models import bvrnn as bvrnn_mod
        from bvsc_tpu.streaming import generator_stream_step

        dec_state0 = {
            "h": jnp.zeros((packet_batch, conf.h_dim), bcfg.dtype),
            "voc": generator_stream_init(vcfg, packet_batch, vsdt),
        }

        def decode_step_fn(p, vp, state, codes, lost, cbits):
            from bvsc_tpu.codec import SCALING

            cb = jnp.broadcast_to(cbits[:, None], codes.shape[:2])
            mel, h = bvrnn_mod.decode_plc(p, bcfg, codes, lost, state["h"], cb)
            voc_state, wav = generator_stream_step(
                vp, vcfg, state["voc"], jnp.swapaxes(mel, 1, 2),
                precision=bcfg.precision, approx_snake=codec.approx_snake,
                compute_dtype=voc_compute_dtype(codec),
            )
            return ({"h": h, "voc": voc_state},
                    wav[:, 0, :].astype(jnp.float32) / SCALING)

        blobs["programs/packet_decode_step.shlo"] = _export(
            decode_step_fn, pspec, vspec, _tree_specs(dec_state0),
            jax.ShapeDtypeStruct((packet_batch, 1, conf.z_dim), f32),
            jax.ShapeDtypeStruct((packet_batch, 1), f32),
            jax.ShapeDtypeStruct((packet_batch,), f32),
        )
        blobs["programs/packet_decode_init.shlo"] = _export(lambda: dec_state0)
        packet_meta = {
            "step": "programs/packet_step.shlo",
            "init": "programs/packet_init.shlo",
            "decode_step": "programs/packet_decode_step.shlo",
            "decode_init": "programs/packet_decode_init.shlo",
            "batch": packet_batch,
        }

    engine_meta = None
    if engine_batch:
        from bvsc_tpu.serve.engine import _decode_tick_impl, _fused_tick_impl
        from bvsc_tpu.streaming import generator_stream_init

        EB = int(engine_batch)
        eng_state0 = {
            "window": jnp.zeros((EB, conf.winsize), f32),
            "h": jnp.zeros((EB, conf.h_dim), bcfg.dtype),
            "voc": generator_stream_init(vcfg, EB, vsdt),
        }

        def eng_tick_fn(p, vp, state, chunk, bits, active):
            return _fused_tick_impl(p, vp, state, chunk, bits, active,
                                    bcfg=bcfg, vcfg=vcfg, frontend=frontend,
                                    approx_snake=codec.approx_snake,
                                    voc_dtype=codec.voc_dtype)

        blobs["programs/engine_tick.shlo"] = _export(
            eng_tick_fn, pspec, vspec, _tree_specs(eng_state0),
            jax.ShapeDtypeStruct((EB, conf.hopsize), f32),
            jax.ShapeDtypeStruct((EB,), f32),
            jax.ShapeDtypeStruct((EB,), jnp.bool_),
        )
        blobs["programs/engine_init.shlo"] = _export(lambda: eng_state0)

        eng_dec_state0 = {
            "h": jnp.zeros((EB, conf.h_dim), bcfg.dtype),
            "voc": generator_stream_init(vcfg, EB, vsdt),
        }

        def eng_dec_tick_fn(p, vp, state, codes, lost, cbits, active):
            return _decode_tick_impl(p, vp, state, codes, lost, cbits,
                                     active, bcfg=bcfg, vcfg=vcfg,
                                     approx_snake=codec.approx_snake,
                                     voc_dtype=codec.voc_dtype)

        blobs["programs/engine_decode_tick.shlo"] = _export(
            eng_dec_tick_fn, pspec, vspec, _tree_specs(eng_dec_state0),
            jax.ShapeDtypeStruct((EB, conf.z_dim), f32),
            jax.ShapeDtypeStruct((EB,), f32),
            jax.ShapeDtypeStruct((EB,), f32),
            jax.ShapeDtypeStruct((EB,), jnp.bool_),
        )
        blobs["programs/engine_decode_init.shlo"] = _export(
            lambda: eng_dec_state0
        )
        engine_meta = {
            "tick": "programs/engine_tick.shlo",
            "init": "programs/engine_init.shlo",
            "decode_tick": "programs/engine_decode_tick.shlo",
            "decode_init": "programs/engine_decode_init.shlo",
            "batch": EB,
        }

    manifest = {
        "format": FORMAT,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batch": batch,
        # the numerics contract ALL programs in this bundle were traced
        # with (one bundle == one consistent vocoder/precision config)
        "serving": {
            "precision": ("default" if bcfg.precision == jax.lax.Precision.DEFAULT
                          else "highest"),
            "approx_snake": bool(codec.approx_snake),
            "voc_dtype": codec.voc_dtype,
        },
        "config": dataclasses.asdict(conf),
        "buckets": buckets,
        "packet": packet_meta,
        "engine": engine_meta,
        "params": {"bvrnn": "params/bvrnn.npz", "vocoder": "params/vocoder.npz"},
    }

    def _npz_bytes(tree) -> bytes:
        buf = io.BytesIO()
        np.savez_compressed(buf, **dict(_flatten_tree(tree)))
        return buf.getvalue()

    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(manifest, indent=1))
        zf.writestr("params/bvrnn.npz", _npz_bytes(codec.bvrnn_params))
        zf.writestr("params/vocoder.npz", _npz_bytes(codec.vocoder_params))
        for name, blob in blobs.items():
            zf.writestr(name, blob)
    os.replace(tmp, path)
    return manifest


# ---------------------------------------------------------------------------
# loading / serving
# ---------------------------------------------------------------------------


class ServingBundle:
    """Reload and serve a ``.bvscx`` bundle.

    Mirrors the live-model API at fixed export shapes:
    ``forward(x, bitrate)``, ``encode(x, bitrate)``, ``decode(codes,
    length)``, and :meth:`packet_codec` for the real-time path.  Programs
    deserialize lazily (first use) and are cached.
    """

    def __init__(self, path: str):
        self.path = path
        # malformed input (not a zip, missing/garbled members) must raise a
        # clean ValueError, never crash — same contract as the .bvsc reader
        try:
            with zipfile.ZipFile(path) as zf:
                self.meta = json.loads(zf.read("meta.json"))
                if self.meta.get("format") != FORMAT:
                    raise ValueError(
                        f"{path}: unknown bundle format "
                        f"{self.meta.get('format')!r}"
                    )
                self.conf = CodecConfig.from_dict(self.meta["config"])
                self.bvrnn_params = _unflatten_npz(
                    np.load(io.BytesIO(zf.read(self.meta["params"]["bvrnn"])))
                )
                self.vocoder_params = _unflatten_npz(
                    np.load(io.BytesIO(zf.read(self.meta["params"]["vocoder"])))
                )
        except (zipfile.BadZipFile, KeyError, json.JSONDecodeError, OSError,
                TypeError) as e:
            # (JSONDecodeError is a ValueError subclass; list it explicitly
            # so garbled JSON gets the same clean wrapping)
            raise ValueError(f"{path}: not a valid .bvscx bundle ({e})") from e
        b = self.meta["batch"]
        self.batch = None if b is None else int(b)  # None == symbolic (any)
        self._programs: dict[str, Any] = {}

    load = classmethod(lambda cls, path: cls(path))

    # -- internals -----------------------------------------------------------

    def _program(self, blob_name: str):
        if blob_name not in self._programs:
            with zipfile.ZipFile(self.path) as zf:
                data = zf.read(blob_name)
            self._programs[blob_name] = jax.export.deserialize(bytearray(data))
        return self._programs[blob_name]

    def _bucket(self, length: int) -> dict:
        for b in self.meta["buckets"]:
            if b["length"] >= length:
                return b
        raise ValueError(
            f"no exported bucket covers {length} samples "
            f"(max {self.meta['buckets'][-1]['length'] if self.meta['buckets'] else 0}); "
            "re-export with a larger `lengths`"
        )

    def _frames(self, length: int) -> int:
        c = self.conf
        pad = c.winsize - c.hopsize  # pad_left + pad_right
        return 1 + (length + pad - c.winsize) // c.hopsize

    def _prep_wave(self, x):
        x = np.asarray(x, np.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        if self.batch is not None and x.shape[0] != self.batch:
            raise ValueError(
                f"bundle exported for batch {self.batch}, got {x.shape[0]}"
            )
        return x, squeeze

    def _bits(self, bitrate, n_frames: int, frames_p: int,
              batch: int) -> np.ndarray:
        """bps (scalar or per-frame schedule) -> (batch, frames_p) bits."""
        bits = np.round(np.asarray(bitrate, np.float64)
                        * self.conf.hopsize / self.conf.fs).astype(np.float32)
        if bits.ndim == 0:
            out = np.full((batch, frames_p), float(bits), np.float32)
            out[:, n_frames:] = 0.0
            return out
        if bits.ndim == 1:
            bits = np.broadcast_to(bits, (batch,) + bits.shape)
        if bits.shape != (batch, n_frames):
            raise ValueError(
                f"per-frame bitrate shape {bits.shape} != ({batch}, {n_frames})"
            )
        return np.pad(bits, ((0, 0), (0, frames_p - n_frames)))

    # -- public API ------------------------------------------------------------

    def forward(self, x, bitrate):
        """One-shot resynthesis via the exported fused program."""
        x, squeeze = self._prep_wave(x)
        L = x.shape[1]
        b = self._bucket(L)
        xp = np.pad(x, ((0, 0), (0, b["length"] - L)))
        n = self._frames(L)
        bits = self._bits(bitrate, n, b["frames"], x.shape[0])
        y = self._program(b["programs"]["forward"]).call(
            self.bvrnn_params, self.vocoder_params, jnp.asarray(xp),
            jnp.asarray(bits), jnp.asarray(n, jnp.int32),
        )
        y = y[:, :L]
        return y[0] if squeeze else y

    __call__ = forward

    def encode(self, x, bitrate):
        x, squeeze = self._prep_wave(x)
        L = x.shape[1]
        b = self._bucket(L)
        xp = np.pad(x, ((0, 0), (0, b["length"] - L)))
        n = self._frames(L)
        bits = self._bits(bitrate, n, b["frames"], x.shape[0])
        codes = self._program(b["programs"]["encode"]).call(
            self.bvrnn_params, jnp.asarray(xp), jnp.asarray(bits)
        )[:, :n]
        return codes[0] if squeeze else codes

    def decode(self, codes, length: int):
        codes = np.asarray(codes, np.float32)
        squeeze = codes.ndim == 2
        if squeeze:
            codes = codes[None]
        T = codes.shape[1]
        b = self._bucket(max(T * self.conf.hopsize, length))
        codes = np.pad(codes, ((0, 0), (0, b["frames"] - T), (0, 0)),
                       constant_values=0.5)
        y = self._program(b["programs"]["decode"]).call(
            self.bvrnn_params, self.vocoder_params, jnp.asarray(codes)
        )[:, :length]
        return y[0] if squeeze else y

    def vocode(self, mel, length: int | None = None):
        """Standalone mel -> waveform (``scripts/synthesize.py`` semantics,
        the reference's ``inference_e2e.py`` capability — no codec −10 dB
        scaling).  ``mel``: (batch, num_mels, frames) or (num_mels, frames);
        ``length`` defaults to frames·hop."""
        mel = np.asarray(mel, np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        T = mel.shape[2]
        hop = self.conf.hopsize
        if length is None:
            length = T * hop
        b = self._bucket(max(T * hop, length))
        # pad future frames at the log-clamp silence floor (ops.mel
        # dynamic_range_compression: log(clamp(., 1e-5))); the causal
        # vocoder's first T·hop samples are unaffected by them
        mel = np.pad(mel, ((0, 0), (0, 0), (0, b["frames"] - T)),
                     constant_values=float(np.log(1e-5)))
        y = self._program(b["programs"]["vocode"]).call(
            self.vocoder_params, jnp.asarray(mel)
        )[:, :length]
        return y[0] if squeeze else y

    def bits_per_frame(self, bitrate):
        """bps -> bits/frame (same rounding as the live codec)."""
        return self.conf.bits_per_frame(bitrate)

    def serving_engine(self) -> "BundleServingEngine":
        """Batched multi-stream serving from the artifact alone (requires
        export with ``engine_batch=N``); one slot per concurrent stream."""
        return BundleServingEngine(self)

    def decode_engine(self) -> "BundleDecodeEngine":
        return BundleDecodeEngine(self)

    def packet_codec(self, bitrate: float = 3000.0) -> "ExportedPacketCodec":
        if not self.meta.get("packet"):
            raise ValueError("bundle was exported without packet programs")
        return ExportedPacketCodec(self, bitrate)

    def packet_decoder(self, conceal_bitrate=None) -> "ExportedPacketDecoder":
        """Receiver-side real-time decoder running the bundle's exported
        ``packet_decode_step`` (codes in -> 256 samples out, prior-based PLC
        for lost frames) — mirrors :class:`bvsc_tpu.streaming.
        StreamingDecoder` with zero model code at serve time."""
        pk = self.meta.get("packet") or {}
        if "decode_step" not in pk:
            raise ValueError(
                "bundle has no receiver packet programs; re-export with a "
                "current exporter (packet=True)"
            )
        return ExportedPacketDecoder(self, conceal_bitrate)


class ExportedPacketCodec(FusedPacketCodec):
    """Real-time packet codec running the bundle's exported step program.

    Reuses :class:`bvsc_tpu.streaming.FusedPacketCodec`'s host-side sample
    bookkeeping (first-frame reflect pre-roll, hop chunking, flush) — only
    the one device program per packet is replaced by the deserialized
    export, so stream == one-shot exactness carries over unchanged.
    """

    def __init__(self, bundle: ServingBundle, bitrate: float = 3000.0):
        # no super().__init__: there is no live codec object; the exported
        # program and the bundle's weights stand in for it
        conf = bundle.conf
        self._bundle = bundle
        self._step_prog = bundle._program(bundle.meta["packet"]["step"])
        self.hop = conf.hopsize
        self.winsize = conf.winsize
        self.pad_left = conf.mel_pad_left
        self.pad_right = conf.winsize - conf.mel_pad_left - conf.hopsize
        self.batch = int(bundle.meta["packet"].get("batch") or bundle.batch)
        self.bits = jnp.full(
            (self.batch,), conf.bits_per_frame(bitrate), jnp.float32
        )
        self.state = bundle._program(bundle.meta["packet"]["init"]).call()
        self._prefix = np.zeros((self.batch, 0), np.float32)
        self._tail = np.zeros((self.batch, 0), np.float32)
        self._started = False
        self._flushed = False

    def _step(self, chunk_dev):
        self.state, codes, wav = self._step_prog.call(
            self._bundle.bvrnn_params, self._bundle.vocoder_params,
            self.state, chunk_dev, self.bits,
        )
        return codes, wav


class ExportedPacketDecoder:
    """Receiver: binary codes in -> waveform out via the exported program.

    Same surface as :class:`bvsc_tpu.streaming.StreamingDecoder` —
    ``feed(codes, lost=None)`` and ``conceal(n)`` — but every step is the
    bundle's serialized ``packet_decode_step`` (decode_plc + streaming
    vocoder, one call per 11.6 ms frame; lossless frames agree with a live
    decoder to float precision — the reloaded program may compile to
    differently-reassociated kernels)."""

    def __init__(self, bundle: ServingBundle, conceal_bitrate=None):
        conf = bundle.conf
        self._bundle = bundle
        self._step_prog = bundle._program(bundle.meta["packet"]["decode_step"])
        self.batch = int(bundle.meta["packet"].get("batch") or bundle.batch)
        self.hop = conf.hopsize
        self.z_dim = conf.z_dim
        cb = (float(conf.z_dim) if conceal_bitrate is None
              else conf.bits_per_frame(conceal_bitrate))
        self.conceal_bits = jnp.full((self.batch,), float(cb), jnp.float32)
        self.state = bundle._program(
            bundle.meta["packet"]["decode_init"]
        ).call()

    def feed(self, codes, lost=None) -> np.ndarray:
        """codes: (batch, n, z_dim); lost: optional (batch, n) 0/1 flags.
        Returns (batch, n*hop) samples."""
        codes = np.asarray(codes, np.float32)
        n = codes.shape[1]
        if lost is None:
            lost = np.zeros((self.batch, n), np.float32)
        lost = np.asarray(lost, np.float32)
        outs = []
        for t in range(n):  # exported program is one frame per call
            self.state, wav = self._step_prog.call(
                self._bundle.bvrnn_params, self._bundle.vocoder_params,
                self.state, jnp.asarray(codes[:, t : t + 1]),
                jnp.asarray(lost[:, t : t + 1]), self.conceal_bits,
            )
            outs.append(np.asarray(wav))
        if not outs:
            return np.zeros((self.batch, 0), np.float32)
        return np.concatenate(outs, axis=1)

    def conceal(self, n_frames: int = 1) -> np.ndarray:
        """Free-run ``n_frames`` lost packets from the prior (PLC)."""
        codes = np.full((self.batch, n_frames, self.z_dim), 0.5, np.float32)
        return self.feed(codes, lost=np.ones((self.batch, n_frames), np.float32))


# ---------------------------------------------------------------------------
# bundle-backed batched serving engines
# ---------------------------------------------------------------------------


def _bundle_batch_sharding(mesh, batch: int):
    """Stream-batch sharding for the bundle-backed engines: the exported
    tick programs are batch-elementwise over the slot axis, so calling them
    with the state/inputs sharded over the mesh's data axis serves the slots
    multi-chip exactly like the live :class:`ServingEngine` (sharding
    propagates through the deserialized call)."""
    if mesh is None:
        return None
    from bvsc_tpu.parallel.mesh import batch_sharded

    if batch % mesh.size:
        raise ValueError("engine batch must divide evenly over the mesh")
    return batch_sharded(mesh)


def _require_engine_meta(bundle: ServingBundle) -> dict:
    eng = bundle.meta.get("engine")
    if not eng:
        raise ValueError(
            "bundle has no serving-engine programs; re-export with "
            "engine_batch=N (export_serving_bundle)"
        )
    return eng


class BundleServingEngine(ServingEngine):
    """:class:`bvsc_tpu.serve.engine.ServingEngine` semantics with every
    device program replaced by the bundle's exported ``engine_tick`` — a
    serving host runs N concurrent full-duplex streams (and the BVSP daemon
    on top, ``scripts/serve_daemon.py --bundle``) from the ``.bvscx``
    artifact alone: no model code, converter, or re-trace at serve time.
    Slot count is fixed at the export's ``engine_batch``."""

    def __init__(self, bundle: ServingBundle, mesh=None):
        # mirrors ServingEngine.__init__ without a live codec: state comes
        # from the exported init program, ticks from the exported tick
        eng = _require_engine_meta(bundle)
        conf = bundle.conf
        self.codec = bundle  # .conf / .bits_per_frame — all the engine needs
        self.B = int(eng["batch"])
        self.hop = conf.hopsize
        self.win = conf.winsize
        self.pad_left = conf.mel_pad_left
        self.z_dim = conf.z_dim
        self._batch_sharding = _bundle_batch_sharding(mesh, self.B)
        self._tick_prog = bundle._program(eng["tick"])
        self._init_prog = bundle._program(eng["init"])
        self.state = self._init_device_state()
        self._init_host_slots()

    def _init_device_state(self):
        return self._put(self._init_prog.call())

    def _tick_call(self, state, chunk, bits, active):
        return self._tick_prog.call(
            self.codec.bvrnn_params, self.codec.vocoder_params, state,
            chunk, bits, active,
        )


class BundleDecodeEngine(DecodeEngine):
    """Decode-only counterpart of :class:`BundleServingEngine` (codes in,
    audio out, per-stream prior-based PLC) from the exported
    ``engine_decode_tick``."""

    def __init__(self, bundle: ServingBundle, mesh=None):
        eng = _require_engine_meta(bundle)
        conf = bundle.conf
        self.codec = bundle
        self.B = int(eng["batch"])
        self.hop = conf.hopsize
        self.z_dim = conf.z_dim
        self._batch_sharding = _bundle_batch_sharding(mesh, self.B)
        self._tick_prog = bundle._program(eng["decode_tick"])
        self._init_prog = bundle._program(eng["decode_init"])
        self.state = self._init_device_state()
        self._init_host_slots()

    def _init_device_state(self):
        return self._put(self._init_prog.call())

    def _tick_call(self, state, codes, lost, cbits, active):
        return self._tick_prog.call(
            self.codec.bvrnn_params, self.codec.vocoder_params, state,
            codes, lost, cbits, active,
        )
