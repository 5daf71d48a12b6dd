"""Benchmark: full codec chain (encode + decode + vocode) at 3 kbps.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_sec_per_sec", "vs_baseline": N}

value   = aggregate audio-seconds coded per wall-second per chip for the
          batched serving config (128 concurrent streams, BASELINE.json
          configs[4]) through the full chain: mel -> BVRNN encode @3 kbps ->
          BVRNN decode -> causal BigVGAN-tiny vocoder.
vs_baseline = value / 100 — the reference publishes no RTF figure ("real
          time" claim only, reference README.md:19); the north-star target
          from BASELINE.json is >100x real time per chip.

Extra diagnostics (single-stream RTF, phase breakdown) go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_speech(seconds: float, n_streams: int) -> np.ndarray:
    """Real MUSHRA speech tiled to the requested shape (falls back to noise)."""
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
    # decorrelate streams with tiny per-stream noise (keeps codes realistic)
    batch = np.tile(speech[None, :], (n_streams, 1))
    batch += 1e-4 * rng.standard_normal(batch.shape)
    return batch.astype(np.float32)


def time_fn(fn, *args, warmup=1, iters=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from bvsc_tpu.codec import BVRNNCodecModel

    log("devices:", jax.devices())

    seconds = 4.0
    n_streams = 128
    bitrate = 3000

    codec = BVRNNCodecModel()
    x = load_speech(seconds, n_streams)
    L = x.shape[1]

    # --- batched serving config: 128 concurrent streams ---------------------
    def full_chain(wav):
        codes = codec.encode(wav, bitrate)
        return codec.decode(codes, L)

    t_batched = time_fn(full_chain, x)
    audio_sec = n_streams * seconds
    throughput = audio_sec / t_batched
    log(f"batched {n_streams} streams x {seconds}s: {t_batched * 1e3:.1f} ms "
        f"-> {throughput:.1f} audio-sec/sec/chip")

    # --- single-stream RTF ---------------------------------------------------
    x1 = x[:1]
    t_single = time_fn(full_chain, x1)
    rtf_single = seconds / t_single
    log(f"single stream: {t_single * 1e3:.1f} ms -> RTF {rtf_single:.1f}x")

    # --- phase breakdown (batched) -------------------------------------------
    t_enc = time_fn(lambda w: codec.encode(w, bitrate), x)
    codes = codec.encode(x, bitrate)
    t_dec = time_fn(lambda c: codec.decode(c, L), codes)
    log(f"phases (batched): encode {t_enc * 1e3:.1f} ms, "
        f"decode+vocode {t_dec * 1e3:.1f} ms")

    print(json.dumps({
        "metric": "codec_throughput_3kbps_128streams",
        "value": round(throughput, 2),
        "unit": "audio_sec_per_sec",
        "vs_baseline": round(throughput / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
