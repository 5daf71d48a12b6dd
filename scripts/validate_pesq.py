"""Validate the self-contained PESQ-WB implementation on the evidence this
environment actually has (no ITU vectors, no ``pesq`` wheel, no network).

Three layers, strongest first:

1. **Signal-level behavior** (PESQ's home turf): identical signals hit the
   4.64 MOS-LQO ceiling; additive noise degrades the score strictly
   monotonically across 40..0 dB SNR; lowpassing degrades monotonically;
   a pure gain change is invisible (level alignment).
2. **Within-family orderings on the human-rated MUSHRA conditions**: for
   each codec family that appears at two operating points (the paper's
   codec at 1.38 vs 5.51 kbps, Lyra at its two rates), the mean PESQ
   score must order the conditions the way the human means do.
3. **Documented negative result — cross-family correlation**: over ALL
   rated conditions the rank correlation of PESQ with the human means is
   reported but NOT asserted positive: every condition is a *generative*
   codec, and loudness-difference models (ITU PESQ included) are known to
   misrank GAN-vocoder outputs against parametric ones — precisely why
   the reference ran a MUSHRA listening test instead of publishing PESQ.
   A slope refit against this data degenerates (a -> 0) and was rejected;
   see bvsc_tpu/eval/pesq.py.

Writes docs/artifacts/pesq_validation.json.

Usage: python scripts/validate_pesq.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATASET = "/root/reference/mushra_results_dataset"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "artifacts", "pesq_validation.json")


def load_22k(path: str) -> np.ndarray:
    import scipy.signal
    from scipy.io import wavfile

    fs, data = wavfile.read(path)
    if data.ndim > 1:
        data = data[:, 0]
    x = data.astype(np.float64) / 32768.0
    if fs != 22050:
        x = scipy.signal.resample_poly(x, 22050, fs)
    return x


def human_means_per_file() -> dict[str, float]:
    from bvsc_tpu.eval.mushra import load_ratings

    rows = load_ratings(os.path.join(DATASET, "ratings_formated_filtered.csv"))
    acc: dict[str, list[float]] = defaultdict(list)
    for r in rows:
        parts = r["file"].replace("\\", "/").split("/")
        acc["/".join(parts[-2:])].extend(float(v) for v in r["ratings"])
    return {k: float(np.mean(v)) for k, v in acc.items()}


def signal_level_checks(x: np.ndarray) -> dict:
    import scipy.signal

    from bvsc_tpu.eval.pesq import pesq_wb

    rng = np.random.default_rng(0)
    out = {"identical": pesq_wb(x, x, 22050),
           "gain_minus10db": pesq_wb(x, x * 10 ** (-0.5), 22050)}
    awgn = {}
    for snr in (40, 30, 20, 10, 0):
        noise = rng.standard_normal(x.size)
        noise *= np.sqrt((x ** 2).mean() / (noise ** 2).mean()) * 10 ** (-snr / 20)
        awgn[snr] = pesq_wb(x, x + noise, 22050)
    out["awgn_by_snr"] = awgn
    lp = {}
    for fc in (7000, 5000, 3000, 1500):
        sos = scipy.signal.butter(8, fc, fs=22050, output="sos")
        lp[fc] = pesq_wb(x, scipy.signal.sosfilt(sos, x), 22050)
    out["lowpass_by_fc"] = lp
    return out


def main() -> None:
    from scipy.stats import spearmanr

    from bvsc_tpu.eval.pesq import pesq_wb

    human = human_means_per_file()
    x = load_22k(os.path.join(DATASET, "audio", "stim_01", "ref.wav"))
    report = {"signal_level": signal_level_checks(x)}
    sl = report["signal_level"]
    assert sl["identical"] > 4.6
    assert abs(sl["gain_minus10db"] - sl["identical"]) < 0.05
    snrs = sorted(sl["awgn_by_snr"])  # ascending SNR
    assert all(sl["awgn_by_snr"][a] < sl["awgn_by_snr"][b]
               for a, b in zip(snrs, snrs[1:])), sl["awgn_by_snr"]
    fcs = sorted(sl["lowpass_by_fc"])
    assert all(sl["lowpass_by_fc"][a] < sl["lowpass_by_fc"][b] + 1e-9
               for a, b in zip(fcs, fcs[1:])), sl["lowpass_by_fc"]
    print("signal-level checks passed:",
          json.dumps(sl, default=lambda v: round(float(v), 3)))

    scores: dict[str, list[float]] = defaultdict(list)
    hums: dict[str, list[float]] = defaultdict(list)
    for sd in sorted(glob.glob(os.path.join(DATASET, "audio", "stim_*"))):
        stim = os.path.basename(sd)
        ref = load_22k(os.path.join(sd, "ref.wav"))
        for wav in sorted(glob.glob(os.path.join(sd, "*.wav"))):
            base = os.path.basename(wav)
            key = f"{stim}/{base}"
            if base == "ref.wav" or key not in human:
                continue
            s = pesq_wb(ref, load_22k(wav), 22050)
            scores[base].append(s)
            hums[base].append(human[key])
            print(f"{key:32s} pesq={s:5.3f} human={human[key]:5.1f}",
                  flush=True)

    cond = {b: {"pesq_mean": float(np.mean(v)),
                "human_mean": float(np.mean(hums[b])), "n": len(v)}
            for b, v in scores.items()}
    report["conditions"] = cond

    families = {"proposed": ("prop_13.wav", "prop_55.wav"),
                "lyra": ("lyra_32.wav", "lyra_6.wav")}
    ok = True
    within = {}
    for fam, (lo, hi) in families.items():
        human_order = cond[lo]["human_mean"] < cond[hi]["human_mean"]
        pesq_order = cond[lo]["pesq_mean"] < cond[hi]["pesq_mean"]
        within[fam] = {"human_prefers": hi if human_order else lo,
                       "pesq_prefers": hi if pesq_order else lo,
                       "agrees": human_order == pesq_order}
        ok &= human_order == pesq_order
        print(f"within-family {fam}: human prefers "
              f"{within[fam]['human_prefers']}, pesq "
              f"{'agrees' if within[fam]['agrees'] else 'DISAGREES'}")
    report["within_family"] = within

    bases = sorted(cond)
    rho = float(spearmanr([cond[b]["pesq_mean"] for b in bases],
                          [cond[b]["human_mean"] for b in bases]).statistic)
    report["cross_family_spearman"] = round(rho, 3)
    report["cross_family_note"] = (
        "negative/weak by construction: all rated conditions are"
        " generative codecs, which PESQ-style models misrank across"
        " families (GAN spectral texture reads as additive disturbance);"
        " within-family orderings above are the valid comparisons")
    print(f"cross-family Spearman vs human means: {rho:+.3f} "
          "(reported, not asserted — see note)")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True,
                  default=lambda v: round(float(v), 4))
    print("->", OUT)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
