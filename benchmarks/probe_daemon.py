"""Daemon serving-capacity probe: N loopback BVSP clients on one chip.

Measures the network serving layer end to end (real sockets, real protocol
framing, the batched engines underneath):

  * offline throughput — N resynth clients each stream S seconds of real
    MUSHRA speech as fast as TCP accepts it; aggregate audio-s/s is the
    daemon's capacity for faster-than-real-time workloads,
  * live latency — one real-time-paced client (one 11.6 ms packet per hop
    interval) measures per-frame round trip p50/p99 while the offline load
    runs, i.e. the latency a live caller sees on a busy server.

Usage: python benchmarks/probe_daemon.py [--streams 16] [--seconds 4]
       [--platform cpu] [--bitrate 3000]

On the axon-tunneled v5e the loopback RTT is host-local, so unlike
bench.py's device-sync methodology this number includes ALL host-side
costs (protocol parse, queueing, numpy staging, device round trip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_speech(seconds: float) -> np.ndarray:
    import scipy.signal
    from scipy.io import wavfile

    fs, data = wavfile.read(
        "/root/reference/mushra_results_dataset/audio/stim_01/ref.wav"
    )
    x = data[:, 0].astype(np.float64) / 32768.0
    x = scipy.signal.resample_poly(x, 22050, fs)
    x = x / np.max(np.abs(x))
    n = int(seconds * 22050)
    reps = int(np.ceil(n / x.shape[0]))
    return np.tile(x, reps)[:n].astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=16)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--bitrate", type=float, default=3000.0)
    p.add_argument("--live_frames", type=int, default=120)
    p.add_argument("--platform", default="default")
    args = p.parse_args()

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
        jax.config.update("jax_platform_name", args.platform)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from bvsc_tpu.codec import BVRNNCodecModel
    from bvsc_tpu.serve.client import CodecClient
    from bvsc_tpu.serve.daemon import CodecDaemon

    codec = BVRNNCodecModel(precision="default")
    x = load_speech(args.seconds)
    hop, fs = codec.conf.hopsize, codec.conf.fs

    with CodecDaemon(codec, port=0, max_streams=args.streams + 1) as d:
        # warmup: compile the fused tick at this slot batch
        with CodecClient("127.0.0.1", d.port, mode="resynth",
                         bitrate=args.bitrate, timeout=1200) as c:
            c.send_audio(x[: 768 + hop * 4])
            c.close_input()
            c.drain()

        # -- offline throughput: N clients, all input up front --------------
        done = []

        def offline(i):
            with CodecClient("127.0.0.1", d.port, mode="resynth",
                             bitrate=args.bitrate, timeout=1200) as c:
                c.send_audio(x)
                c.close_input()
                out = c.drain()
                done.append(out["audio"].shape[0])

        ts = [threading.Thread(target=offline, args=(i,))
              for i in range(args.streams)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        dt = time.perf_counter() - t0
        audio_s = sum(done) / fs
        thr = audio_s / dt
        print(f"offline: {args.streams} streams x {args.seconds:.1f}s "
              f"in {dt*1e3:.0f} ms -> {thr:.1f} audio-s/s", file=sys.stderr)

        # -- live latency under load -----------------------------------------
        bg_stop = threading.Event()

        def background():
            while not bg_stop.is_set():
                with CodecClient("127.0.0.1", d.port, mode="resynth",
                                 bitrate=args.bitrate, timeout=1200) as c:
                    c.send_audio(x)
                    c.close_input()
                    c.drain()

        bgs = [threading.Thread(target=background, daemon=True)
               for _ in range(max(1, args.streams // 2))]
        for t in bgs:
            t.start()

        lat = []
        with CodecClient("127.0.0.1", d.port, mode="resynth",
                         bitrate=args.bitrate, timeout=1200) as c:
            # preroll one hop short of the first frame, so every timed send
            # is the one that completes a frame (no pipeline offset: each
            # recv waits for the output its own send triggered)
            c.send_audio(x[: 768 - hop])
            pos = 768 - hop
            for i in range(args.live_frames):
                t0 = time.perf_counter()
                c.send_audio(x[pos : pos + hop])
                pos += hop
                kind, wav = c.recv()
                lat.append(time.perf_counter() - t0)
                # real-time pacing
                rest = hop / fs - (time.perf_counter() - t0)
                if rest > 0:
                    time.sleep(rest)
            c.close_input()
            c.drain()
        bg_stop.set()
        for t in bgs:  # let in-flight background streams drain cleanly
            t.join(timeout=60)
        lat = np.array(lat[4:]) * 1e3
        p50, p99 = np.percentile(lat, 50), np.percentile(lat, 99)
        print(f"live frame RTT under load: p50={p50:.2f} ms p99={p99:.2f} ms "
              f"(budget 34.8 ms)", file=sys.stderr)

    print(json.dumps({
        "daemon_offline_audio_s_per_s": round(thr, 1),
        "daemon_live_p50_ms": round(float(p50), 2),
        "daemon_live_p99_ms": round(float(p99), 2),
        "streams": args.streams,
    }))


if __name__ == "__main__":
    main()
