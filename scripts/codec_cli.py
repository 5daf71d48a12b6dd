"""Codec file CLI: encode wavs to .bvsc bitstream files and back.

The reference ships no codec CLI (only vocoder CLIs, SURVEY §1); this adds
one around the same public model.  The container format is minimal:

  magic 'BVSC', version u8, z_dim u8, bits/frame u16, fs u32, frames u32,
  then the bit-packed payload (first-k priority bits per frame, little
  endian — ops.bitpack / native C kernel).

Usage:
  python scripts/codec_cli.py encode in.wav out.bvsc --bitrate 3000
  python scripts/codec_cli.py decode out.bvsc roundtrip.wav
"""

from __future__ import annotations

import argparse
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MAGIC = b"BVSC"
VERSION = 1


def write_bvsc(path, codes: np.ndarray, bits_per_frame: int, fs: int) -> None:
    from bvsc_tpu.ops.bitpack import pack_codes

    frames, z_dim = codes.shape
    payload = pack_codes(codes, bits_per_frame)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<BBHII", VERSION, z_dim, bits_per_frame, fs, frames))
        f.write(payload)


def read_bvsc(path):
    from bvsc_tpu.ops.bitpack import payload_nbytes, unpack_codes

    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not a BVSC bitstream")
        version, z_dim, bits, fs, frames = struct.unpack("<BBHII", f.read(12))
        if version != VERSION:
            raise ValueError(f"{path}: unsupported version {version}")
        payload = f.read()
    # Validate the untrusted frame-count header against the actual payload
    # size BEFORE allocating frames*z_dim floats (a crafted header could
    # otherwise request multi-GB allocations / OOB reads downstream).
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
    p.add_argument("--config", default=None)
    p.add_argument("--bvrnn_checkpoint", default=None)
    p.add_argument("--vocoder_checkpoint", default=None)
    args = p.parse_args(argv)

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

    if args.mode == "encode":
        wav, _ = load_wav(args.input, fs)
        if wav.ndim > 1:
            wav = wav[:, 0]
        codes = np.asarray(codec.encode(wav[None, :], args.bitrate))[0]
        write_bvsc(args.output, codes, codec.conf.bits_per_frame(args.bitrate), fs)
        dur = wav.shape[0] / fs
        size = os.path.getsize(args.output)
        print(f"{args.output}: {codes.shape[0]} frames, {size} B "
              f"({size * 8 / dur:.1f} bps incl. 16 B header)")
    else:
        codes, bits, fs_stream = read_bvsc(args.input)
        length = codes.shape[0] * codec.conf.hopsize
        wav = np.asarray(codec.decode(codes[None], length))[0]
        save_wav(wav, args.output, fs_stream)
        print(f"{args.output}: {length} samples @ {fs_stream} Hz "
              f"(payload was {bits} bits/frame)")


if __name__ == "__main__":
    main()
