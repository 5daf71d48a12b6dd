"""How much does the BVSP entropy wire compress on NON-collapsed codes?

VERDICT r3 #6: the advertised "80-96 % payload reduction" was measured on
the demo checkpoint, whose masked KLD collapsed to ~0.007 on the 41-s
corpus — most bit positions are nearly constant BECAUSE the model overfit,
so that figure is demo-specific, not representative of a full-budget model.

This script measures the wire coder (``serve/entropy_wire.py``
AdaptiveCodesCoder, the exact per-message rANS framing both clients use,
8-frame blocks) on the SAME held-out MUSHRA speech for two weight sources:

  * the shipped demo checkpoint (collapsed KLD; the optimistic bound),
  * a full-size random-init model (healthy code entropy; the conservative
    bound — an untrained encoder emits near-maximum-entropy bits, so a
    fully-trained full-corpus model should land between the two).

Writes ``docs/artifacts/entropy_wire_stats.json`` with payload bits/frame
and reduction per bitrate per source.

Run: python scripts/entropy_representativeness.py --platform cpu
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cli_common

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=os.path.join(REPO, "configs/varbitrate.toml"))
    p.add_argument("--wavs", default=os.path.join(REPO, "data_local/wavs"))
    p.add_argument("--checkpoints", default=",".join((
        os.path.join(REPO, "chkpts/bvsc_bvrnn_demo_step3000_f16.npz"),
        os.path.join(REPO, "chkpts/bvsc_bvrnn_demo_cl_step1300_f16.npz"))),
        help="comma-separated BVRNN npz checkpoints to measure")
    p.add_argument("--stimuli", type=int, default=4,
                   help="number of stimuli to code (entropy stats converge "
                        "fast; 4 x ~2.5 s is plenty)")
    p.add_argument("--block", type=int, default=8,
                   help="frames per entropy message (daemon default)")
    p.add_argument("--out", default=os.path.join(
        REPO, "docs/artifacts/entropy_wire_stats.json"))
    _cli_common.add_platform_arg(p)
    return p.parse_args(argv)


def measure_source(codec, wavs, bitrates, block, conf) -> dict:
    from bvsc_tpu.serve.entropy_wire import AdaptiveCodesCoder

    out = {}
    for bps in bitrates:
        k = int(codec.bits_per_frame(bps))
        payload_bits = 0
        frames = 0
        coder = AdaptiveCodesCoder(conf.z_dim)  # counts persist per stream
        dec = AdaptiveCodesCoder(conf.z_dim)
        for path in wavs:
            from bvsc_tpu.data.audio import load_wav

            x = np.asarray(load_wav(path, conf.fs)[0], np.float32)[None, :]
            codes = np.asarray(codec.encode(x, bps))[0]  # (T, z)
            for t0 in range(0, codes.shape[0] - block + 1, block):
                blk = codes[t0 : t0 + block]
                payload = coder.encode_block(blk, k)
                # roundtrip check: the wire must be lossless
                back = dec.decode_block(payload, block, k)  # (block, z_dim)
                assert np.array_equal(back[:, :k], blk[:, :k]), \
                    "wire roundtrip broke"
                payload_bits += 8 * len(payload)
                frames += block
        raw = float(k)
        got = payload_bits / max(frames, 1)
        out[str(int(bps))] = {
            "raw_bits_per_frame": raw,
            "payload_bits_per_frame": round(got, 3),
            "reduction_pct": round(100.0 * (1.0 - got / raw), 2),
            "frames": frames,
        }
    return out


def main(argv=None):
    args = parse_args(argv)
    _cli_common.setup_runtime(args)

    from bvsc_tpu.codec import BVRNNCodecModel
    from bvsc_tpu.config import CodecConfig

    conf = CodecConfig.from_toml(args.config)
    wavs = sorted(glob.glob(os.path.join(args.wavs, "*.wav")))[: args.stimuli]
    if not wavs:
        raise SystemExit(f"no wavs under {args.wavs}")
    bitrates = (1380.0, 3000.0, 5500.0)

    report = {"block_frames": args.block, "bitrates_bps": list(bitrates),
              "stimuli": [os.path.basename(w) for w in wavs], "sources": {}}

    # demo checkpoints: step3000 = the r2 overfit ckpt the 80-96 % claim
    # was measured on (collapsed KLD); cl_step1300 = the r3 shipped ckpt
    for ck in filter(None, args.checkpoints.split(",")):
        if not os.path.exists(ck):
            continue
        codec = BVRNNCodecModel(config=conf, bvrnn_chkpt_path=ck,
                                vocoder_params={})
        name = os.path.splitext(os.path.basename(ck))[0]
        report["sources"][name] = measure_source(
            codec, wavs, bitrates, args.block, conf)

    # full-size random init (healthy/near-max code entropy — conservative)
    codec_r = BVRNNCodecModel(config=conf, vocoder_params={}, seed=0)
    report["sources"]["random_init_fullsize"] = measure_source(
        codec_r, wavs, bitrates, args.block, conf)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    for src, rows in report["sources"].items():
        for bps, r in sorted(rows.items(), key=lambda kv: float(kv[0])):
            print(f"{src} @{bps} bps: {r['raw_bits_per_frame']:.0f} -> "
                  f"{r['payload_bits_per_frame']:.2f} bits/frame "
                  f"({r['reduction_pct']:.1f}% reduction, n={r['frames']})")
    print("->", args.out)


if __name__ == "__main__":
    main()
