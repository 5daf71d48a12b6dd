"""Vocoder checkpoint selection on held-out END-TO-END quality.

The reference ships one fine-tuned generator (``ftbvrnn``,
``chkpts/bigvgan_causal_tiny_ftbvrnn_g_step3500000``) but no selection
tooling.  This picks between candidate generators by running the FULL codec
chain (wav -> mel -> BVRNN @3 kbps -> candidate vocoder) on held-out speech
and ranking by mel-L1 between input and resynthesized audio — the metric
the fine-tuning lineage exists to optimize (the vocoder must excel on
*BVRNN-decoded* mels, reference ``meldataset.py:197-214``).

Usage:
  python scripts/select_vocoder_ckpt.py \
      --bvrnn_checkpoint chkpts/bvsc_bvrnn_demo_augfull_step1800_f16.npz \
      --candidates 'exp/voc_ft4/g_????????' exp/voc_tpu/g_00010000 \
      --stimuli /root/reference/mushra_results_dataset/audio/stim_15/ref.wav
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _cli_common


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/varbitrate.toml")
    p.add_argument("--bvrnn_checkpoint", required=True)
    p.add_argument("--candidates", nargs="+", required=True,
                   help="generator checkpoint paths or globs")
    p.add_argument("--stimuli", nargs="+",
                   default=["/root/reference/mushra_results_dataset/audio/"
                            "stim_15/ref.wav"])
    p.add_argument("--bitrate", type=float, default=3000.0)
    _cli_common.add_platform_arg(p)
    args = p.parse_args(argv)
    _cli_common.setup_runtime(args)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from bvsc_tpu import BVRNNCodecModel
    from bvsc_tpu.config import CodecConfig
    from bvsc_tpu.ops.mel import MelFrontend
    from evaluate_codec import load_22k

    conf = CodecConfig.from_toml(args.config)
    mf = MelFrontend(
        sampling_rate=conf.fs, n_fft=conf.winsize, num_mels=conf.num_mels,
        hop_size=conf.hopsize, win_size=conf.winsize, fmin=conf.fmin,
        fmax=conf.fmax, padding_left=conf.mel_pad_left,
    )
    stims = [load_22k(s) for s in args.stimuli]
    mels_in = [np.asarray(mf(jnp.asarray(s[None, :]))) for s in stims]

    cands = []
    for c in args.candidates:
        hits = sorted(glob.glob(c))
        cands.extend(hits if hits else [c])

    results = []
    for path in cands:
        codec = BVRNNCodecModel(
            args.config,
            bvrnn_chkpt_path=args.bvrnn_checkpoint,
            vocoder_chkpt_path=path,
        )
        l1s = []
        for s, m_in in zip(stims, mels_in):
            out = np.asarray(codec(s[None, :], args.bitrate))[0]
            m_out = np.asarray(mf(jnp.asarray(out[None, : s.shape[0]])))
            T = min(m_in.shape[-1], m_out.shape[-1])
            l1s.append(float(np.abs(m_in[..., :T] - m_out[..., :T]).mean()))
        l1 = float(np.mean(l1s))
        results.append((l1, path))
        print(f"{path:55s} e2e mel-L1 = {l1:.4f}", flush=True)

    best = min(results)
    print(f"\nBEST: {best[1]}  (e2e mel-L1 {best[0]:.4f})")


if __name__ == "__main__":
    main()
