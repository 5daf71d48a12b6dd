"""Benchmark: full codec chain (encode + decode + vocode) at 3 kbps.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_sec_per_sec", "vs_baseline": N}

value   = aggregate audio-seconds coded per wall-second per chip for the
          batched serving config (128 concurrent streams, BASELINE.json
          configs[4]) through the full chain: mel -> BVRNN encode @3 kbps ->
          BVRNN decode -> causal BigVGAN-tiny vocoder, in the production
          serving configuration (single-pass bf16 MXU matmuls; the fused
          one-program __call__, whose encode scan emits the decoded mel via
          the closed-loop state-sync invariant — no second decode scan).
vs_baseline = value / 100 — the reference publishes no RTF figure ("real
          time" claim only, reference README.md:19); the north-star target
          from BASELINE.json is >100x real time per chip.

Methodology notes:
  * inputs are pre-placed on device and completion is synced by scalar
    readback (on this platform ``block_until_ready`` returns early, and the
    host<->device tunnel would otherwise dominate the measurement);
    end-to-end numbers including host transfers go to stderr,
  * a persistent XLA compilation cache keeps warm-start costs out,
  * fast-mode codes are cross-checked against reference-parity (HIGHEST
    precision) codes on real speech and the agreement rate is reported.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_speech(seconds: float, n_streams: int) -> np.ndarray:
    """Real MUSHRA speech tiled to shape (falls back to noise)."""
    try:
        import scipy.signal
        from scipy.io import wavfile

        fs, data = wavfile.read(
            "/root/reference/mushra_results_dataset/audio/stim_01/ref.wav"
        )
        speech = data[:, 0].astype(np.float64) / 32768.0
        speech = scipy.signal.resample_poly(speech, 22050, fs)
        speech = speech / np.max(np.abs(speech))
    except Exception as e:  # pragma: no cover
        log("falling back to noise input:", e)
        speech = np.random.default_rng(0).standard_normal(22050 * 4) * 0.1
    n = int(seconds * 22050)
    reps = int(np.ceil(n / speech.shape[0]))
    speech = np.tile(speech, reps)[:n]
    rng = np.random.default_rng(1)
    batch = np.tile(speech[None, :], (n_streams, 1))
    batch += 1e-4 * rng.standard_normal(batch.shape)
    return batch.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from bvsc_tpu.codec import BVRNNCodecModel

    log("devices:", jax.devices())

    seconds = 4.0
    n_streams = 128
    bitrate = 3000

    codec = BVRNNCodecModel(precision="default")  # production serving mode
    x_host = load_speech(seconds, n_streams)
    L = x_host.shape[1]
    x = jax.device_put(jnp.asarray(x_host))

    def sync(v):
        # reduce on device, read back ONE scalar (full-array readback would
        # bill the 30 MB/s tunnel to the kernel being measured)
        return float(jax.tree.leaves(v)[0].sum())

    def full_chain(wav):
        # the public __call__: ONE fused program (mel -> encode_decode scan
        # -> vocoder); the encode scan's closed-loop state sync already
        # computes the decoded mel, so no separate decode scan runs
        return codec(wav, bitrate)

    def full_chain_2prog(wav):
        codes = codec.encode(wav, bitrate)
        return codec.decode(codes, L)

    def time_fn(fn, *args, iters=5):
        sync(fn(*args))  # warmup/compile
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / iters

    # --- batched serving config: 128 concurrent streams ---------------------
    t_batched = time_fn(full_chain, x)
    audio_sec = n_streams * seconds
    throughput = audio_sec / t_batched
    log(f"batched {n_streams} streams x {seconds}s: {t_batched * 1e3:.1f} ms "
        f"-> {throughput:.1f} audio-sec/sec/chip (compute, fast mode)")

    # --- phase breakdown (two-program composition, for comparison) ----------
    t_2prog = time_fn(full_chain_2prog, x)
    t_enc = time_fn(lambda w: codec.encode(w, bitrate), x)
    codes = codec.encode(x, bitrate)
    t_dec = time_fn(lambda c: codec.decode(c, L), codes)
    log(f"two-program encode->decode: {t_2prog * 1e3:.1f} ms "
        f"({audio_sec / t_2prog:.1f} audio-sec/sec); "
        f"phases: encode {t_enc * 1e3:.1f} ms, decode+vocode {t_dec * 1e3:.1f} ms")

    # --- batched with weight-only int8 BVRNN scans ---------------------------
    # (serving config upgrade: scan weights are the HBM-resident bulk; int8
    # halves their traffic.  Headline switches only if faster AND >=99.8%
    # code agreement vs the bf16 fast mode.)
    try:
        codec_q8 = BVRNNCodecModel(precision="default", quantize="int8")

        def full_chain_q8(wav):
            return codec_q8(wav, bitrate)

        t_batched_q8 = time_fn(full_chain_q8, x)
        agree_q8 = float(
            (np.asarray(codec_q8.encode(x[:8], bitrate))
             == np.asarray(codec.encode(x[:8], bitrate))).mean()
        )
        log(f"batched int8 scans: {t_batched_q8 * 1e3:.1f} ms -> "
            f"{audio_sec / t_batched_q8:.1f} audio-sec/sec/chip "
            f"(agreement {agree_q8 * 100:.3f}%)")
        if t_batched_q8 < t_batched and agree_q8 >= 0.998:
            throughput = audio_sec / t_batched_q8
            log("headline uses int8-scan serving config")
    except Exception as e:  # pragma: no cover
        log("batched int8 path skipped:", e)

    # --- single-stream RTF ---------------------------------------------------
    x1 = x[:1]
    t_single = time_fn(lambda w: full_chain(w), x1)
    log(f"single stream: {t_single * 1e3:.1f} ms -> RTF {seconds / t_single:.1f}x")

    # --- single-stream with weight-only int8 scans ---------------------------
    try:
        codec_q = BVRNNCodecModel(precision="default", quantize="int8")

        def full_chain_q(wav):
            return codec_q(wav, bitrate)

        t_single_q = time_fn(full_chain_q, x1)
        log(f"single stream int8 scans: {t_single_q * 1e3:.1f} ms -> "
            f"RTF {seconds / t_single_q:.1f}x")
        c_q = np.asarray(codec_q.encode(x[:8], bitrate))
        c_f = np.asarray(codec.encode(x[:8], bitrate))
        log(f"int8 code agreement vs fast-f32: {(c_q == c_f).mean() * 100:.3f}%")

        # mixed mode: enc+phi_x bf16, rest int8 (higher code agreement)
        codec_qm = BVRNNCodecModel(precision="default", quantize="int8_mixed")
        t_single_qm = time_fn(lambda w: codec_qm(w, bitrate), x1)
        c_qm = np.asarray(codec_qm.encode(x[:8], bitrate))
        log(f"single stream int8_mixed scans: {t_single_qm * 1e3:.1f} ms -> "
            f"RTF {seconds / t_single_qm:.1f}x "
            f"(agreement {(c_qm == c_f).mean() * 100:.3f}%)")
    except Exception as e:  # pragma: no cover
        log("int8 path skipped:", e)

    # --- streaming p50 frame latency (FusedPacketCodec, 1 dispatch/packet) --
    try:
        from bvsc_tpu.streaming import FusedPacketCodec

        fc = FusedPacketCodec(codec, batch=1, bitrate=bitrate)
        lat = []
        xs = np.asarray(x_host[0])
        for i in range(0, 256 * 120, 256):
            t0 = time.perf_counter()
            fc.process(xs[None, i : i + 256])
            lat.append(time.perf_counter() - t0)
        lat = np.array(lat[4:]) * 1e3
        log(f"streaming frame latency (11.6 ms packets): "
            f"p50={np.percentile(lat, 50):.2f} ms p99={np.percentile(lat, 99):.2f} ms "
            f"(dominated by tunnel RTT in this env)")
    except Exception as e:  # pragma: no cover
        log("streaming latency check skipped:", e)

    # --- end-to-end including host transfers (context, not headline) --------
    t0 = time.perf_counter()
    out = np.asarray(full_chain(jnp.asarray(x_host)))
    t_e2e = time.perf_counter() - t0
    log(f"end-to-end incl. host transfers: {t_e2e * 1e3:.1f} ms "
        f"({audio_sec / t_e2e:.1f} audio-sec/sec; tunnel-bound in this env)")

    # --- fast-mode vs parity-mode code agreement -----------------------------
    try:
        parity = BVRNNCodecModel(precision="highest")
        xa = x[:8]
        c_fast = np.asarray(codec.encode(xa, bitrate))
        c_ref = np.asarray(parity.encode(xa, bitrate))
        agree = float((c_fast == c_ref).mean())
        log(f"fast-mode code agreement vs parity mode: {agree * 100:.3f}%")
    except Exception as e:  # pragma: no cover
        log("code agreement check skipped:", e)

    print(json.dumps({
        "metric": "codec_throughput_3kbps_128streams",
        "value": round(throughput, 2),
        "unit": "audio_sec_per_sec",
        "vs_baseline": round(throughput / 100.0, 3),
    }))


def run_with_retry(fn, max_tries=4, delay_s=180.0):
    """Run ``fn``; on a backend-init RuntimeError, sleep and re-exec.

    The tunneled TPU backend occasionally reports UNAVAILABLE for a few
    minutes (remote lease churn), and jax caches the failed backend init for
    the process lifetime — so the retry must be a re-exec, not a loop.
    Attempt count is carried across execs in ``BVSC_BENCH_RETRY``.
    """
    import os

    try:
        fn()
    except RuntimeError as e:
        tries = int(os.environ.get("BVSC_BENCH_RETRY", "0"))
        if "Unable to initialize backend" not in str(e) or tries >= max_tries - 1:
            raise
        log(f"backend unavailable (attempt {tries + 1}/{max_tries}), "
            f"retrying in {delay_s:.0f} s:", e)
        time.sleep(delay_s)
        os.environ["BVSC_BENCH_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    run_with_retry(main)
