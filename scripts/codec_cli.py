"""Codec file CLI: encode wavs to .bvsc bitstream files and back.

The reference ships no codec CLI (only vocoder CLIs, SURVEY §1); this adds
one around the same public model.  The container format is minimal:

  magic 'BVSC', version u8, z_dim u8, bits/frame u16, fs u32, frames u32,
  then the payload:
    version 1 — bit-packed first-k priority bits per frame, little endian
                (ops.bitpack / native C kernel);
    version 2 — the same bits rANS-coded against the BVRNN's own prior
                network (bvsc_tpu.entropy / native/rans.c): ~17-30 %
                smaller payload at bit-identical codes; decoding needs the
                same BVRNN checkpoint (the prior IS the entropy model).

Usage:
  python scripts/codec_cli.py encode in.wav out.bvsc --bitrate 3000 [--entropy]
  python scripts/codec_cli.py decode out.bvsc roundtrip.wav
"""

from __future__ import annotations

import argparse
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _cli_common

import numpy as np

MAGIC = b"BVSC"
VERSION_RAW = 1
VERSION_ENTROPY = 2
# bits/frame header sentinel: a per-frame u8 allocation table follows the
# header (variable bitrate files — mid-stream rate switches, the codec's
# headline capability; k <= z_dim <= 255 so a real constant never collides)
_BITS_VBR = 0xFFFF
# v2 payload size does not bound frames (a confident prior compresses
# arbitrarily well), so cap the untrusted header instead: 2^22 frames
# ≈ 13.5 h of audio ≈ 1 GB of decoded codes.
_MAX_ENTROPY_FRAMES = 1 << 22


def write_bvsc(path, codes: np.ndarray, bits_per_frame, fs: int,
               coder=None) -> None:
    """bits_per_frame: int (constant) or (frames,) array (VBR — a per-frame
    u8 table is stored; entries are clamped to [0, z_dim], the effective
    allocation — only z_dim bits exist per frame, matching the model-layer
    clamp).  coder: a ``bvsc_tpu.entropy.PriorEntropyCoder`` for wire-format
    v2 (rANS against the BVRNN prior); None writes v1 raw packing."""
    from bvsc_tpu.ops.bitpack import pack_codes

    frames, z_dim = codes.shape
    ks = np.asarray(bits_per_frame, np.int64)
    if coder is not None:
        version, payload = VERSION_ENTROPY, coder.encode(codes, bits_per_frame)
    else:
        version, payload = VERSION_RAW, pack_codes(codes, bits_per_frame)
    with open(path, "wb") as f:
        f.write(MAGIC)
        if ks.ndim == 0:
            f.write(struct.pack("<BBHII", version, z_dim, int(ks), fs, frames))
        else:
            if ks.shape != (frames,):
                raise ValueError(f"bits_per_frame shape {ks.shape} != ({frames},)")
            f.write(struct.pack("<BBHII", version, z_dim, _BITS_VBR, fs, frames))
            f.write(np.clip(ks, 0, z_dim).astype(np.uint8).tobytes())
        f.write(payload)


def read_bvsc(path, coder_factory=None):
    """coder_factory: zero-arg callable returning a ``PriorEntropyCoder``,
    required only for v2 streams (the prior is the entropy model, so the
    decoder needs the same BVRNN checkpoint).  Returns (codes,
    bits_per_frame, fs) — bits_per_frame is an int or a (frames,) array."""
    from bvsc_tpu.ops.bitpack import payload_nbytes, unpack_codes

    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not a BVSC bitstream")
        header = f.read(12)
        if len(header) != 12:
            raise ValueError(f"{path}: truncated header")
        version, z_dim, bits, fs, frames = struct.unpack("<BBHII", header)
        if version not in (VERSION_RAW, VERSION_ENTROPY):
            raise ValueError(f"{path}: unsupported version {version}")
        if bits == _BITS_VBR:
            # the table is frames-proportional: cap the untrusted header
            # before the read (same rationale as the v2 cap below)
            if frames > _MAX_ENTROPY_FRAMES:
                raise ValueError(f"{path}: frames header {frames} exceeds cap")
            table = f.read(frames)
            if len(table) != frames:
                raise ValueError(f"{path}: truncated VBR allocation table")
            bits = np.frombuffer(table, np.uint8).astype(np.int32)
        payload = f.read()
    if version == VERSION_ENTROPY:
        if coder_factory is None:
            raise ValueError(
                f"{path}: entropy-coded stream (v2) needs the BVRNN prior "
                "to decode — pass coder_factory"
            )
        if frames > _MAX_ENTROPY_FRAMES:
            raise ValueError(f"{path}: frames header {frames} exceeds cap")
        coder = coder_factory()
        if coder.cfg.z_dim != z_dim:
            raise ValueError(f"{path}: z_dim {z_dim} != model {coder.cfg.z_dim}")
        return coder.decode(payload, bits, frames), bits, fs
    # v1: validate the untrusted frame-count header against the actual
    # payload size BEFORE allocating frames*z_dim floats (a crafted header
    # could otherwise request multi-GB allocations / OOB reads downstream).
    need = payload_nbytes(bits, frames, z_dim)
    if len(payload) < need:
        raise ValueError(
            f"{path}: truncated payload ({len(payload)} B, header implies {need} B)"
        )
    return unpack_codes(payload, bits, frames, z_dim), bits, fs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["encode", "decode"])
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--bitrate", type=float, default=3000.0)
    p.add_argument("--entropy", action="store_true",
                   help="write wire-format v2: rANS-code the bits against "
                        "the BVRNN prior (~17-30%% smaller payload, "
                        "bit-identical codes; decode needs the same "
                        "checkpoint)")
    p.add_argument("--fs_out", type=int, default=None,
                   help="decode only: resample the output to this rate "
                        "(e.g. 16000 — the paper's 16 kHz MUSHRA "
                        "conditions are produced this way)")
    p.add_argument("--config", default=None)
    p.add_argument("--bvrnn_checkpoint", default=None)
    p.add_argument("--vocoder_checkpoint", default=None)
    _cli_common.add_platform_arg(p)
    args = p.parse_args(argv)
    _cli_common.setup_runtime(args)

    from bvsc_tpu import BVRNNCodecModel
    from bvsc_tpu.data.audio import load_wav, save_wav

    kwargs = {}
    if args.config:
        kwargs["config_path"] = args.config
    codec = BVRNNCodecModel(
        bvrnn_chkpt_path=args.bvrnn_checkpoint,
        vocoder_chkpt_path=args.vocoder_checkpoint,
        **kwargs,
    )
    fs = codec.conf.fs

    def coder_factory():
        from bvsc_tpu.entropy import PriorEntropyCoder

        return PriorEntropyCoder(codec.bvrnn_params, codec.bvrnn_cfg)

    if args.mode == "encode":
        # any input rate: resample to the model rate like the reference's
        # own example flow (reference example.py:12-16)
        wav, fs_in = load_wav(args.input)
        if wav.ndim > 1:
            wav = wav[:, 0]
        if fs_in != fs:
            import scipy.signal

            wav = scipy.signal.resample_poly(
                wav.astype(np.float64), fs, fs_in
            ).astype(np.float32)
        if not codec.conf.var_bit:
            # a fixed-bitrate model emits z_dim informative bits per frame
            # no matter what was requested; writing fewer into the file
            # would silently corrupt the decode
            full = codec.conf.z_dim * codec.conf.fs / codec.conf.hopsize
            k = int(round(codec.conf.bits_per_frame(args.bitrate)))
            if k != codec.conf.z_dim:
                raise SystemExit(
                    f"fixed-bitrate config: only --bitrate {full:.0f} "
                    f"(= {codec.conf.z_dim} bits/frame) is valid, "
                    f"got {args.bitrate}"
                )
        codes = np.asarray(codec.encode(wav[None, :], args.bitrate))[0]
        write_bvsc(args.output, codes, codec.conf.bits_per_frame(args.bitrate),
                   fs, coder=coder_factory() if args.entropy else None)
        dur = wav.shape[0] / fs
        size = os.path.getsize(args.output)
        print(f"{args.output}: {codes.shape[0]} frames, {size} B "
              f"({size * 8 / dur:.1f} bps incl. 16 B header"
              f"{', entropy-coded' if args.entropy else ''})")
    else:
        codes, bits, fs_stream = read_bvsc(args.input, coder_factory)
        length = codes.shape[0] * codec.conf.hopsize
        wav = np.asarray(codec.decode(codes[None], length))[0]
        if args.fs_out and args.fs_out != fs_stream:
            import scipy.signal

            wav = scipy.signal.resample_poly(
                wav.astype(np.float64), args.fs_out, fs_stream
            ).astype(np.float32)
            fs_stream = args.fs_out
        save_wav(wav, args.output, fs_stream)
        bits_desc = (f"VBR, mean {float(np.mean(bits)):.1f}"
                     if np.ndim(bits) else bits)
        print(f"{args.output}: {wav.shape[0]} samples @ {fs_stream} Hz "
              f"(payload was {bits_desc} bits/frame)")


if __name__ == "__main__":
    main()
