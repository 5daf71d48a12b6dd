"""Dump BVRNN-decoded mels to .npy for vocoder fine-tuning.

The reference fine-tunes its vocoder on BVRNN-decoded mel spectrograms
(checkpoint name ``bigvgan_causal_tiny_ftbvrnn_g_step3500000``); its
``meldataset.py:197-214`` consumes precomputed ``<stem>.npy`` mels, but the
tool that produces them was never published.  This recreates it: wav ->
(x * SCALING) -> mel -> BVRNN encode @ bitrate -> BVRNN decode -> save the
decoded log-mel as ``(num_mels, frames)`` float32 — exactly the tensor the
codec's vocoder consumes at decode time.

The dumped mels live in the −10 dB SCALING domain (the codec divides the
vocoder output by SCALING afterwards, reference ``bvrnn_codec_model.py:71``),
so fine-tuning should pair them with SCALING-scaled target audio:
``scripts/train_vocoder.py --fine_tuning`` applies that scale by default
(``--audio_scale``).

Usage:
  python scripts/dump_finetune_mels.py --config configs/varbitrate.toml \
      --bvrnn_checkpoint CKPT --input_training_file train.txt \
      --input_wavs_dir WAVS --output_dir mels/ --bitrate 3000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _cli_common

import numpy as np


def dump_mels(codec, files: list[str], output_dir: str, bitrate: float,
              *, random_bitrate: tuple[float, float] | None = None,
              seed: int = 0, verbose: bool = True) -> list[str]:
    """Encode+mel-decode each wav through ``codec`` and write
    ``output_dir/<stem>.npy`` of shape (num_mels, frames).

    ``random_bitrate=(lo, hi)``: draw one bitrate per utterance uniformly —
    fine-tuning across the codec's operating range (the reference trains the
    variable-bitrate model with per-sequence bitrate redraws,
    ``configs/config_varBitRate.toml:29`` p_bitratechange)."""
    from bvsc_tpu.data.audio import load_wav

    os.makedirs(output_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    written = []
    for path in files:
        wav, _ = load_wav(path, codec.conf.fs)
        if wav.ndim > 1:
            wav = wav[:, 0]
        # NOTE: no peak normalization — the fine-tuning dataset mode loads
        # raw audio (reference meldataset.py:160-163 normalizes only when
        # not fine-tuning), so the mels must match the raw waveform.
        br = (rng.uniform(*random_bitrate) if random_bitrate is not None
              else bitrate)
        codes = codec.encode(wav.astype(np.float32), br)
        mel = np.asarray(codec.decode_to_mel(codes), np.float32)
        out = os.path.join(
            output_dir, os.path.splitext(os.path.basename(path))[0] + ".npy"
        )
        np.save(out, mel)
        written.append(out)
        if verbose:
            print(f"{out}: {mel.shape} @ {br:.0f} bps")
    return written


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--bvrnn_checkpoint", default=None)
    p.add_argument("--input_wavs_dir", default="")
    p.add_argument("--input_training_file", default=None,
                   help="pipe-separated filelist (reference format); "
                        "if omitted, every .wav under --input_wavs_dir")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--bitrate", type=float, default=3000.0)
    p.add_argument("--random_bitrate", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="draw one bitrate per utterance uniformly in [LO, HI]")
    p.add_argument("--seed", type=int, default=0)
    _cli_common.add_platform_arg(p)
    args = p.parse_args(argv)
    _cli_common.setup_runtime(args)

    from bvsc_tpu import BVRNNCodecModel

    kwargs = {}
    if args.config:
        kwargs["config_path"] = args.config
    codec = BVRNNCodecModel(bvrnn_chkpt_path=args.bvrnn_checkpoint, **kwargs)

    if args.input_training_file:
        with open(args.input_training_file) as f:
            files = [
                os.path.join(args.input_wavs_dir, line.split("|")[0])
                for line in f.read().splitlines() if line
            ]
        files = [f if f.endswith(".wav") else f + ".wav" for f in files]
    else:
        files = sorted(
            os.path.join(args.input_wavs_dir, f)
            for f in os.listdir(args.input_wavs_dir) if f.endswith(".wav")
        )
    written = dump_mels(codec, files, args.output_dir, args.bitrate,
                        random_bitrate=tuple(args.random_bitrate)
                        if args.random_bitrate else None,
                        seed=args.seed)
    print(f"wrote {len(written)} mel files to {args.output_dir}")


if __name__ == "__main__":
    main()
