"""Serve a codec over TCP (BVSP/1) — the production serving daemon CLI.

Runs :class:`bvsc_tpu.serve.daemon.CodecDaemon`: every connection is one
stream (encode / decode / full resynthesis), all connected streams advance
together in one batched XLA dispatch per 11.6 ms frame.  The reference has
no serving layer at all (SURVEY §1).

  python scripts/serve_daemon.py --config configs/varbitrate.toml \
      --bvrnn chkpts/bvsc_bvrnn_demo_augfull_step1800_f16.npz \
      --vocoder chkpts/bvsc_vocoder_demo_cl_ft_g_step600 \
      --port 9630 --max_streams 128

Clients: ``bvsc_tpu.serve.client.CodecClient`` (numpy + stdlib only).
"""

from __future__ import annotations

import argparse
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _cli_common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None,
                   help="codec TOML (reference-compatible); default config "
                        "when omitted")
    p.add_argument("--bvrnn", default=None, help="BVRNN checkpoint path")
    p.add_argument("--vocoder", default=None, help="vocoder checkpoint path")
    p.add_argument("--bundle", default=None,
                   help="serve from an AOT .bvscx bundle exported with "
                        "--engine_batch (no model code or checkpoints "
                        "needed; overrides --config/--bvrnn/--vocoder)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9630,
                   help="TCP port (0 = ephemeral, printed at startup)")
    p.add_argument("--max_streams", type=int, default=None,
                   help="stream slots per engine (the fixed device batch; "
                        "default 128, or the bundle's exported slot count)")
    p.add_argument("--precision", default="default",
                   choices=["default", "highest"],
                   help="'default' = bf16 MXU serving mode, 'highest' = "
                        "reference-parity f32")
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8", "int8_mixed"],
                   help="weight-only int8 BVRNN scans")
    p.add_argument("--send_queue_bytes", type=int, default=32 << 20,
                   help="per-connection outbound queue bound; a client "
                        "reading slower than its stream produces is "
                        "evicted when it overflows")
    p.add_argument("--max_buffered_seconds", type=float, default=600.0,
                   help="per-stream unprocessed-input bound (audio "
                        "seconds); input beyond it is a protocol error")
    p.add_argument("--sndbuf", type=int, default=None,
                   help="optional SO_SNDBUF cap per connection (bounds "
                        "kernel send-buffer memory)")
    _cli_common.add_platform_arg(p)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    _cli_common.setup_runtime(args)

    # Service managers stop with SIGTERM.  Install the handler BEFORE the
    # model build: a start-timeout during the (possibly ~45 min cold) TPU
    # compile must not fall on the default die-immediately disposition —
    # killing mid-compile wedges the remote device lease (CLAUDE.md).  The
    # handler only sets a flag; the serve loop honors it between ticks, and
    # a SIGTERM that lands during startup exits cleanly right after it.
    import signal
    import threading

    stop = threading.Event()
    signal.signal(signal.SIGTERM, lambda signum, frame: stop.set())

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from bvsc_tpu.serve.daemon import CodecDaemon

    if args.bundle:
        from bvsc_tpu.serve.export import ServingBundle

        codec = ServingBundle.load(args.bundle)
    else:
        from bvsc_tpu.codec import DEFAULT_CONFIG, BVRNNCodecModel

        codec = BVRNNCodecModel(
            args.config or DEFAULT_CONFIG,
            bvrnn_chkpt_path=args.bvrnn,
            vocoder_chkpt_path=args.vocoder,
            precision=args.precision,
            quantize=args.quantize,
        )
    daemon = CodecDaemon(codec, host=args.host, port=args.port,
                         max_streams=args.max_streams,
                         send_queue_bytes=args.send_queue_bytes,
                         max_buffered_seconds=args.max_buffered_seconds,
                         sndbuf=args.sndbuf)
    daemon.start()
    print(f"BVSP/1 serving on {args.host}:{daemon.port} "
          f"({daemon._eng.B} stream slots"
          f"{', AOT bundle' if args.bundle else ''})", flush=True)
    try:
        while not stop.wait(1.0):
            pass
    except KeyboardInterrupt:
        pass
    finally:
        daemon.close()


if __name__ == "__main__":
    main()
