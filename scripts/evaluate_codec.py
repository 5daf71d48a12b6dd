"""Objective evaluation of the codec over the MUSHRA stimuli.

The reference evaluates with in-training ``validate()`` metrics
(``third_party/BigVGAN/train.py:150-227``: mel-L1, MRSTFT, PESQ) and a human
MUSHRA test at the paper's two operating points (16 and 64 bits/frame =
1.378 / 5.5125 kbps, condition names in
``mushra_results_dataset/ratings_formated.csv``).  This standalone harness
runs the same objective metrics over any wav set at any bitrates — the
eval-layer CLI the reference keeps buried inside its trainer — plus a
self-contained STOI intelligibility score (the PESQ wheel is unavailable
in this image; STOI needs no external package).

Usage:
  python scripts/evaluate_codec.py \
      --stimuli_dir /root/reference/mushra_results_dataset/audio \
      --bvrnn_checkpoint chkpts/bvsc_bvrnn_demo_augfull_step1800_f16.npz \
      --vocoder_checkpoint chkpts/bvsc_vocoder_demo_cl_ft_g_step600 \
      --bitrates 1378 5512

With no checkpoints it evaluates random-init weights (useful only as a
pipeline smoke test).  Prints one row per (stimulus, bitrate) and a summary
JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _cli_common

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/varbitrate.toml")
    p.add_argument("--stimuli_dir",
                   default="/root/reference/mushra_results_dataset/audio",
                   help="directory of stim_*/ref.wav (or a flat dir of wavs)")
    p.add_argument("--bvrnn_checkpoint", default=None)
    p.add_argument("--vocoder_checkpoint", default=None)
    p.add_argument("--bitrates", type=float, nargs="+", default=[1378.0, 5512.0],
                   help="bits/s; paper points: 1378 (16 b/frame), 5512 (64)")
    p.add_argument("--precision", default="highest",
                   choices=["highest", "default"])
    p.add_argument("--entropy", action="store_true",
                   help="also report the effective bitrate after "
                        "prior-adaptive entropy coding (wire-format v2)")
    p.add_argument("--loss_rate", type=float, default=None,
                   help="also evaluate under this random packet-loss "
                        "probability with prior-based concealment "
                        "(metrics reported with a _plc suffix)")
    p.add_argument("--loss_seed", type=int, default=0)
    p.add_argument("--loss_burst", type=float, default=None,
                   help="mean burst length in frames: draw losses from a "
                        "two-state Gilbert-Elliott channel at the same "
                        "average --loss_rate instead of i.i.d. frames")
    p.add_argument("--limit", type=int, default=None, help="max stimuli")
    p.add_argument("--out_json", default=None)
    _cli_common.add_platform_arg(p)
    return p.parse_args(argv)


def draw_losses(rng, n: int, rate: float, mean_burst=None) -> np.ndarray:
    """(n,) 0/1 loss flags: i.i.d. at `rate`, or a two-state Gilbert-Elliott
    chain with the given mean burst length at the same average rate
    (bursty losses are the realistic packet-network case and stress PLC
    state re-convergence much harder than isolated drops)."""
    if not mean_burst or mean_burst <= 1.0:
        return (rng.uniform(size=n) < rate).astype(np.float32)
    # stationary loss prob = p_gb / (p_gb + p_bg); mean burst = 1 / p_bg
    p_bg = 1.0 / mean_burst
    p_gb = rate * p_bg / max(1.0 - rate, 1e-9)
    lost = np.zeros(n, np.float32)
    bad = rng.uniform() < rate
    for t in range(n):
        lost[t] = float(bad)
        bad = rng.uniform() < (1.0 - p_bg if bad else p_gb)
    return lost


def find_wavs(root: str) -> list[str]:
    nested = sorted(glob.glob(os.path.join(root, "stim_*", "ref.wav")))
    return nested if nested else sorted(glob.glob(os.path.join(root, "*.wav")))


def load_22k(path: str) -> np.ndarray:
    import scipy.signal

    from bvsc_tpu.data.audio import load_wav, peak_normalize

    x, fs = load_wav(path)  # dtype-aware [-1, 1] float (int16/int32/float)
    if x.ndim > 1:
        x = x[:, 0]
    if fs != 22050:
        x = scipy.signal.resample_poly(x, 22050, fs)
    return peak_normalize(x).astype(np.float32)


def main(argv=None):
    args = parse_args(argv)
    _cli_common.setup_runtime(args)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))

    from bvsc_tpu.codec import BVRNNCodecModel
    from bvsc_tpu.eval.metrics import mcd, mel_l1, mrstft, pesq_wb_16k, stoi
    from bvsc_tpu.ops.mel import MelFrontend

    codec = BVRNNCodecModel(
        args.config,
        bvrnn_chkpt_path=args.bvrnn_checkpoint,
        vocoder_chkpt_path=args.vocoder_checkpoint,
        precision=args.precision,
    )
    conf = codec.conf
    frontend = MelFrontend(
        sampling_rate=conf.fs, n_fft=conf.winsize, num_mels=conf.num_mels,
        hop_size=conf.hopsize, win_size=conf.winsize, fmin=conf.fmin,
        fmax=conf.fmax, padding_left=conf.mel_pad_left,
    )

    wavs = find_wavs(args.stimuli_dir)
    if args.limit:
        wavs = wavs[: args.limit]
    if not wavs:
        raise SystemExit(f"no wavs under {args.stimuli_dir}")

    ecoder = None
    if args.entropy:
        from bvsc_tpu.entropy import PriorEntropyCoder

        ecoder = PriorEntropyCoder(codec.bvrnn_params, codec.bvrnn_cfg)

    rows = []
    for path in wavs:
        x = load_22k(path)
        name = os.path.basename(os.path.dirname(path)) or os.path.basename(path)
        for bps in args.bitrates:
            y = np.asarray(codec(x[None, :], bps))[0][: x.shape[0]]
            xj, yj = jnp.asarray(x[None, :]), jnp.asarray(y[None, :])
            row = {
                "stim": name,
                "bps": bps,
                "bits_per_frame": codec.bits_per_frame(bps),
                "mel_l1": float(mel_l1(frontend, xj, yj)),
                "mrstft": float(mrstft(yj, xj)),
                "stoi": float(stoi(x, y)),
                "mcd_db": float(mcd(frontend, x, y)),
            }
            codes = None
            if args.loss_rate is not None or ecoder is not None:
                codes = np.asarray(codec.encode(x[None, :], bps))[0]
            if args.loss_rate is not None:
                # per-row seed: stimuli/bitrates get independent loss
                # patterns (a single fixed pattern would bias the means)
                lrng = np.random.default_rng(
                    [args.loss_seed, hash(name) & 0x7FFFFFFF, int(bps)]
                )
                lost = draw_losses(
                    lrng, codes.shape[0], args.loss_rate, args.loss_burst
                )
                y_plc = np.asarray(codec.decode(
                    codes[None], x.shape[0], lost=lost[None],
                    conceal_bitrate=bps,
                ))[0]
                yp = jnp.asarray(y_plc[None, :])
                row["loss_pct"] = round(100.0 * float(lost.mean()), 2)
                row["mel_l1_plc"] = float(mel_l1(frontend, xj, yp))
                row["stoi_plc"] = float(stoi(x, y_plc))
            if ecoder is not None:
                m = ecoder.measure(codes, int(round(codec.bits_per_frame(bps))))
                # coded payload bits per second of audio
                row["entropy_bps"] = 8.0 * m["coded_bytes"] / (x.shape[0] / conf.fs)
                row["entropy_saving_pct"] = m["saving_pct"]
            p = pesq_wb_16k(x, y)
            if p is not None:
                row["pesq_wb"] = float(p)
            rows.append(row)
            print(" ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                           for k, v in row.items()), flush=True)

    summary = {}
    for bps in args.bitrates:
        sel = [r for r in rows if r["bps"] == bps]
        summary[str(bps)] = {
            k: round(float(np.mean([r[k] for r in sel])), 4)
            for k in ("mel_l1", "mrstft", "stoi", "mcd_db", *(
                ("pesq_wb",) if all("pesq_wb" in r for r in sel) else ()), *(
                ("entropy_bps", "entropy_saving_pct")
                if all("entropy_bps" in r for r in sel) else ()), *(
                ("mel_l1_plc", "stoi_plc")
                if all("mel_l1_plc" in r for r in sel) else ()))
        }
    out = {"n_stimuli": len(wavs), "summary": summary}
    print(json.dumps(out))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"rows": rows, **out}, f, indent=2)


if __name__ == "__main__":
    main()
