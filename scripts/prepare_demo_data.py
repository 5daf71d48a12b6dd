"""Rebuild the demo-training corpus (``data_local/``) from the reference
MUSHRA stimuli.

The training evidence in ``docs/TRAINING.md`` used the 16 clean reference
signals from the MUSHRA listening-test dataset
(``/root/reference/mushra_results_dataset/audio/stim_*/ref.wav`` — the only
speech shipped with the reference repo), resampled 24 kHz -> 22 050 Hz and
split 14 train / 2 held-out (stim_15 + stim_16).  That corpus lived in the
gitignored ``data_local/`` directory; this script recreates it so every
trainer command in docs/TRAINING.md runs from a clean checkout:

    python scripts/prepare_demo_data.py            # writes data_local/
    python scripts/train_bvrnn.py --config configs/varbitrate.toml \
        --input_wavs_dir data_local/wavs \
        --input_training_file data_local/train.txt \
        --input_validation_file data_local/val.txt ...

The filelist format matches the reference trainer's expectations
(reference ``third_party/BigVGAN/meldataset.py:98-117``: one basename per
line, ``.wav`` appended by the loader).
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_SRC = "/root/reference/mushra_results_dataset/audio"
DEFAULT_VAL = ["stim_15", "stim_16"]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--src", default=DEFAULT_SRC,
                   help="directory of stim_*/ref.wav clean reference signals")
    p.add_argument("--out", default="data_local",
                   help="output corpus directory (wavs/ + filelists)")
    p.add_argument("--val", nargs="*", default=DEFAULT_VAL,
                   help="stimulus names held out for validation")
    p.add_argument("--fs", type=int, default=22050)
    return p.parse_args(argv)


def main(argv=None):
    import scipy.signal

    from bvsc_tpu.data.audio import load_wav, save_wav

    args = parse_args(argv)
    refs = sorted(glob.glob(os.path.join(args.src, "stim_*", "ref.wav")))
    if not refs:
        raise SystemExit(f"no stim_*/ref.wav under {args.src}")
    wav_dir = os.path.join(args.out, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    train, val = [], []
    for path in refs:
        name = os.path.basename(os.path.dirname(path))  # stim_NN
        x, fs = load_wav(path)
        if x.ndim > 1:
            x = x[:, 0]
        if fs != args.fs:
            x = scipy.signal.resample_poly(x, args.fs, fs)
        save_wav(np.asarray(x, np.float32), os.path.join(wav_dir, name + ".wav"),
                 args.fs)
        (val if name in set(args.val) else train).append(name)
    unknown = set(args.val) - {os.path.basename(os.path.dirname(p)) for p in refs}
    if unknown:
        raise SystemExit(f"--val names not found in corpus: {sorted(unknown)}")
    for fname, names in (("train.txt", train), ("val.txt", val)):
        with open(os.path.join(args.out, fname), "w") as f:
            f.write("\n".join(names) + "\n")
    print(f"wrote {len(train)} train / {len(val)} val wavs at {args.fs} Hz "
          f"under {args.out}/")


if __name__ == "__main__":
    main()
