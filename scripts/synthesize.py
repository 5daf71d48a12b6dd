"""Vocoder-only synthesis CLI — counterpart of the reference
``third_party/BigVGAN/inference.py`` (wav -> mel -> wav) and
``inference_e2e.py`` (.npy mel -> wav).

Usage:
  python scripts/synthesize.py --input_wavs_dir IN --output_dir OUT \
      --checkpoint_file exp/voc/g_00050000 --config configs/varbitrate.toml
  python scripts/synthesize.py --input_mels_dir IN_NPY --output_dir OUT ...
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _cli_common

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_wavs_dir", default=None)
    p.add_argument("--input_mels_dir", default=None)
    p.add_argument("--output_dir", default="generated_files")
    p.add_argument("--checkpoint_file", required=True,
                   help="torch g_* file or Orbax directory")
    p.add_argument("--config", default=None,
                   help="codec TOML or BigVGAN-style JSON; when omitted, a "
                        "config.toml/config.json beside the checkpoint is "
                        "used (reference inference.py:83), else "
                        "configs/varbitrate.toml")
    p.add_argument("--fs_out", type=int, default=None,
                   help="resample outputs to this rate before writing")
    _cli_common.add_platform_arg(p)
    return p.parse_args(argv)


def _resample(wav, fs, fs_out):
    """Returns (wav', fs'): polyphase-resampled to fs_out when given."""
    if not fs_out or fs_out == fs:
        return wav, fs
    import numpy as np
    import scipy.signal

    return scipy.signal.resample_poly(
        wav.astype(np.float64), fs_out, fs
    ).astype(np.float32), fs_out


def main(argv=None):
    args = parse_args(argv)
    _cli_common.setup_runtime(args)
    if (args.input_wavs_dir is None) == (args.input_mels_dir is None):
        raise SystemExit("give exactly one of --input_wavs_dir / --input_mels_dir")

    import jax.numpy as jnp

    from bvsc_tpu.codec import SCALING, _load_vocoder_checkpoint
    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.data.audio import load_wav, peak_normalize, save_wav
    from bvsc_tpu.models import vocoder as voc_mod
    from bvsc_tpu.ops.mel import MelFrontend

    config_path = args.config
    if config_path is None:
        config_path = (_cli_common.find_config_near(args.checkpoint_file)
                       or "configs/varbitrate.toml")
        print(f"using config {config_path}")
    if config_path.endswith(".json"):
        # standalone vocoder JSON (reference inference.py:83-89)
        import json

        with open(config_path) as f:
            raw = json.load(f)
        from bvsc_tpu.config import VocoderConfig

        vcfg = VocoderConfig.from_dict(raw)
        fs = raw.get("sampling_rate", 22050)
        frontend = MelFrontend(
            sampling_rate=fs, n_fft=raw.get("n_fft", 1024),
            num_mels=raw.get("num_mels", 80),
            hop_size=raw.get("hop_size", 256),
            win_size=raw.get("win_size", 1024), fmin=raw.get("fmin", 0),
            fmax=raw.get("fmax", 8000),
            padding_left=raw.get("mel_pad_left", 256),
        )
    else:
        conf = CodecConfig.from_toml(config_path)
        vcfg, fs = conf.vocoder_config, conf.fs
        frontend = MelFrontend(
            sampling_rate=conf.fs, n_fft=conf.winsize, num_mels=conf.num_mels,
            hop_size=conf.hopsize, win_size=conf.winsize, fmin=conf.fmin,
            fmax=conf.fmax, padding_left=conf.mel_pad_left,
        )
    params = _load_vocoder_checkpoint(args.checkpoint_file, vcfg, jnp.float32)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.input_wavs_dir:
        files = sorted(glob.glob(os.path.join(args.input_wavs_dir, "*.wav")))
        for f in files:
            wav, _ = load_wav(f, fs)
            if wav.ndim > 1:
                wav = wav[:, 0]
            wav = peak_normalize(wav) * 0.95
            mel = frontend(jnp.asarray(wav[None, :]) * SCALING)
            out = voc_mod.generator_apply(
                params, vcfg, mel, wav.shape[0]
            )[0, 0, :] / SCALING
            dst = os.path.join(
                args.output_dir,
                os.path.splitext(os.path.basename(f))[0] + "_generated.wav",
            )
            wav_out, fs_out = _resample(np.asarray(out), fs, args.fs_out)
            save_wav(wav_out, dst, fs_out)
            print(dst)
    else:
        files = sorted(glob.glob(os.path.join(args.input_mels_dir, "*.npy")))
        for f in files:
            mel = np.load(f)
            if mel.ndim == 2:
                mel = mel[None]
            out = voc_mod.generator_apply(
                params, vcfg, jnp.asarray(mel), None
            )[0, 0, :]
            dst = os.path.join(
                args.output_dir,
                os.path.splitext(os.path.basename(f))[0] + "_generated_e2e.wav",
            )
            wav_out, fs_out = _resample(np.asarray(out), fs, args.fs_out)
            save_wav(wav_out, dst, fs_out)
            print(dst)


if __name__ == "__main__":
    main()
