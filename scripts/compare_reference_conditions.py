"""Compare codec output against the reference's PUBLISHED condition audio.

The reference's checkpoints are empty LFS pointers, but its MUSHRA dataset
ships the actual decoded audio of every listening-test condition
(``mushra_results_dataset/audio/stim_*/``: prop_13/prop_55 = the paper's
codec at 1.38/5.51 kbps, lyra_32/lyra_6, audiodec_8, encodec_6/15, 16 kHz
variants) plus the raw human ratings.  This harness:

1. scores every published condition wav against ``ref.wav`` with the
   objective eval metrics (mel-L1, MRSTFT, STOI, MCD),
2. scores THIS framework's codec (any checkpoints) at chosen bitrates on
   the same stimuli with the same metrics,
3. reports the per-condition table side by side with the published MUSHRA
   means, and the Spearman rank correlation of each objective metric with
   the human scores over the rated conditions — validating the objective
   metrics against the human data the reference shipped but never used
   programmatically (its repo has no eval harness at all, SURVEY §4).

Usage:
  python scripts/compare_reference_conditions.py \
      --bvrnn_checkpoint chkpts/bvsc_bvrnn_demo_augfull_step1800_f16.npz \
      --vocoder_checkpoint chkpts/bvsc_vocoder_demo_cl_ft_g_step600 \
      --bitrates 1378 5512

``--skip_ours`` scores only the published conditions (no model run).
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

DATASET = "/root/reference/mushra_results_dataset"


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/varbitrate.toml")
    p.add_argument("--dataset", default=DATASET)
    p.add_argument("--bvrnn_checkpoint", default=None)
    p.add_argument("--vocoder_checkpoint", default=None)
    p.add_argument("--bitrates", type=float, nargs="+",
                   default=[1378.0, 5512.0],
                   help="paper operating points: 1378 / 5512 bps")
    p.add_argument("--skip_ours", action="store_true",
                   help="score only the published condition wavs")
    p.add_argument("--limit", type=int, default=None, help="max stimuli")
    p.add_argument("--out_json", default=None)
    _cli_common.add_platform_arg(p)
    return p.parse_args(argv)


def spearman(a, b) -> float:
    """Spearman rank correlation."""
    from scipy.stats import spearmanr

    return float(spearmanr(a, b).statistic)


def main(argv=None):
    args = parse_args(argv)
    _cli_common.setup_runtime(args)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))

    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.eval.metrics import mcd, mel_l1, mrstft, stoi
    from bvsc_tpu.eval.mushra import condition_stats, load_ratings
    from bvsc_tpu.ops.mel import MelFrontend
    from evaluate_codec import load_22k

    conf = CodecConfig.from_toml(args.config)
    frontend = MelFrontend(
        sampling_rate=conf.fs, n_fft=conf.winsize, num_mels=conf.num_mels,
        hop_size=conf.hopsize, win_size=conf.winsize, fmin=conf.fmin,
        fmax=conf.fmax, padding_left=conf.mel_pad_left,
    )

    # condition name <-> wav basename, from the ratings CSV itself
    rows = load_ratings(os.path.join(args.dataset,
                                     "ratings_formated_filtered.csv"))
    base_to_cond = {}
    for r in rows:
        base = os.path.basename(r["file"])
        base_to_cond.setdefault(base, r["condition"])
    mushra = condition_stats(rows)

    stim_dirs = sorted(glob.glob(os.path.join(args.dataset, "audio",
                                              "stim_*")))
    if args.limit:
        stim_dirs = stim_dirs[: args.limit]
    if not stim_dirs:
        raise SystemExit(f"no stimuli under {args.dataset}")

    codec = None
    if not args.skip_ours:
        from bvsc_tpu.codec import BVRNNCodecModel

        codec = BVRNNCodecModel(
            args.config,
            bvrnn_chkpt_path=args.bvrnn_checkpoint,
            vocoder_chkpt_path=args.vocoder_checkpoint,
        )

    def score(ref: np.ndarray, deg: np.ndarray) -> dict:
        n = min(ref.shape[0], deg.shape[0])
        r, d = ref[:n], deg[:n]
        rj, dj = jnp.asarray(r[None, :]), jnp.asarray(d[None, :])
        return {
            "mel_l1": float(mel_l1(frontend, rj, dj)),
            "mrstft": float(mrstft(dj, rj)),
            "stoi": float(stoi(r, d)),
            "mcd_db": float(mcd(frontend, r, d)),
        }

    per_cond: dict[str, list[dict]] = {}
    for sd in stim_dirs:
        stim = os.path.basename(sd)
        ref = load_22k(os.path.join(sd, "ref.wav"))
        for wav in sorted(glob.glob(os.path.join(sd, "*.wav"))):
            base = os.path.basename(wav)
            if base == "ref.wav":
                continue
            s = score(ref, load_22k(wav))
            per_cond.setdefault(base, []).append(s)
            print(f"{stim} {base:18s} " + " ".join(
                f"{k}={v:.4f}" for k, v in s.items()), flush=True)
        if codec is not None:
            for bps in args.bitrates:
                y = np.asarray(codec(ref[None, :], bps))[0][: ref.shape[0]]
                s = score(ref, y)
                per_cond.setdefault(f"ours_{int(bps)}", []).append(s)
                print(f"{stim} ours_{int(bps):<13d} " + " ".join(
                    f"{k}={v:.4f}" for k, v in s.items()), flush=True)

    metrics = ("mel_l1", "mrstft", "stoi", "mcd_db")
    table = {}
    for cond, ss in sorted(per_cond.items()):
        table[cond] = {m: round(float(np.mean([s[m] for s in ss])), 4)
                       for m in metrics}
        table[cond]["n"] = len(ss)
        mcond = base_to_cond.get(cond)
        if mcond and mcond in mushra:
            table[cond]["mushra_mean"] = round(mushra[mcond]["mean"], 1)
            table[cond]["mushra_condition"] = mcond

    hdr = f"{'condition':20s} " + " ".join(f"{m:>8s}" for m in metrics) \
        + "   MUSHRA"
    print("\n" + hdr)
    print("-" * len(hdr))
    for cond, t in table.items():
        mu = f"{t['mushra_mean']:8.1f}" if "mushra_mean" in t else "       -"
        print(f"{cond:20s} " + " ".join(f"{t[m]:8.4f}" for m in metrics) + mu)

    # objective-vs-human rank correlation over the rated conditions
    rated = [c for c in table if "mushra_mean" in table[c]]
    corr = {}
    if len(rated) >= 3:
        hums = [table[c]["mushra_mean"] for c in rated]
        for m in metrics:
            objs = [table[c][m] for c in rated]
            corr[m] = round(spearman(objs, hums), 3)
        print("\nSpearman rank corr with MUSHRA means "
              f"(over {len(rated)} rated conditions): "
              + " ".join(f"{m}={corr[m]:+.3f}" for m in metrics))

    out = {"n_stimuli": len(stim_dirs), "conditions": table,
           "spearman_vs_mushra": corr}
    print(json.dumps({"spearman_vs_mushra": corr}))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
