"""Export a trained codec to an AOT serving bundle (.bvscx).

The bundle carries StableHLO programs (lowered for CPU+TPU by default) plus
the weights — a serving host reloads it with
``bvsc_tpu.serve.ServingBundle`` and needs no model code, converter, or
config parsing (see ``bvsc_tpu/serve/export.py``).  The reference has no
deployment artifact beyond its torch checkpoints
(``bvrnn_codec_model.py:38-42``).

Usage:
  python scripts/export_serving.py --out demo.bvscx \
    --bvrnn chkpts/bvsc_bvrnn_demo_augfull_step1800_f16.npz \
    --vocoder chkpts/bvsc_vocoder_demo_cl_ft_g_step600 \
    --batch 1 --seconds 1 4 16 --platforms cpu tpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _cli_common import add_platform_arg, setup_runtime  # noqa: E402


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None,
                   help="codec TOML (default: configs/varbitrate.toml)")
    p.add_argument("--bvrnn", default=None, help="BVRNN checkpoint path")
    p.add_argument("--vocoder", default=None, help="vocoder checkpoint path")
    p.add_argument("--out", required=True, help="output .bvscx path")
    p.add_argument("--batch", default="1",
                   help="request batch size, or 'any' for a symbolic batch "
                        "dimension (one program serves every batch size)")
    p.add_argument("--seconds", type=float, nargs="+", default=[4.0],
                   help="length buckets to export, in seconds of audio")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--no_packet", action="store_true",
                   help="skip the real-time packet programs")
    p.add_argument("--engine_batch", type=int, default=None,
                   help="also export the batched serving-engine tick "
                        "programs at N stream slots (enables "
                        "ServingBundle.serving_engine()/decode_engine() and "
                        "`serve_daemon.py --bundle`)")
    p.add_argument("--quantize", default=None, choices=["int8", "int8_mixed"])
    add_platform_arg(p)
    args = p.parse_args(argv)
    setup_runtime(args)

    from bvsc_tpu.codec import DEFAULT_CONFIG, BVRNNCodecModel
    from bvsc_tpu.serve.export import export_serving_bundle

    codec = BVRNNCodecModel(
        args.config or DEFAULT_CONFIG,
        bvrnn_chkpt_path=args.bvrnn,
        vocoder_chkpt_path=args.vocoder,
        quantize=args.quantize,
    )
    lengths = tuple(int(s * codec.conf.fs) for s in args.seconds)
    batch = None if args.batch == "any" else int(args.batch)
    manifest = export_serving_bundle(
        codec, args.out, batch=batch, lengths=lengths,
        packet=not args.no_packet, engine_batch=args.engine_batch,
        platforms=tuple(args.platforms),
    )
    kb = os.path.getsize(args.out) / 1e3
    buckets = [b["length"] for b in manifest["buckets"]]
    eng = manifest.get("engine")
    print(f"{args.out}: {kb:.0f} kB, batch {args.batch}, "
          f"buckets {buckets}, platforms {manifest['platforms']}, "
          f"packet={'yes' if manifest['packet'] else 'no'}, "
          f"engine={eng['batch'] if eng else 'no'}")


if __name__ == "__main__":
    main()
