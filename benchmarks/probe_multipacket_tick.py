"""Multi-packet serving-tick probe (VERDICT r3 #8).

The daemon ticks ONE fused dispatch per 11.6 ms packet per engine; at 128
streams the device does ~0.5 ms of work per packet, so the per-dispatch
host/tunnel overhead — not compute — caps how many engines one chip can
serve.  Chaining k packet steps into one dispatch amortizes that overhead at
the cost of +（k−1)·11.6 ms added latency (the daemon would aggregate k
packets per stream before ticking).

Measures, for k in {1, 2, 4, 8, 16}:
  * device compute per packet (scan-chained, dispatch-free — the floor),
  * host wall-clock per packet for one k-chained dispatch through this
    environment's tunnel (the number that decides daemon capacity here),
and prints the implied packets/s/engine-dispatch-stream and the added
algorithmic latency.

Run: python benchmarks/probe_multipacket_tick.py  (real TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from bench import load_speech
    from bvsc_tpu.codec import BVRNNCodecModel
    from bvsc_tpu.streaming import FusedPacketCodec, _fused_packet_step

    print("devices:", jax.devices(), flush=True)
    B = 128
    codec = BVRNNCodecModel(precision="default")
    x = load_speech(4.0, B)
    fc = FusedPacketCodec(codec, batch=B, bitrate=3000.0)
    fc.process(x[:, : fc.winsize - fc.pad_left])

    bcfg, vcfg, frontend = codec.bvrnn_cfg, codec.conf.vocoder_config, codec.frontend
    budget_ms = (fc.winsize - fc.pad_left) / codec.conf.fs * 1e3

    def make_chain(k):
        @jax.jit
        def chain(params, voc_params, state, chunks, bits):
            def body(st, chunk):
                st, codes, wav = _fused_packet_step(
                    params, voc_params, st, chunk, bits,
                    bcfg=bcfg, vcfg=vcfg, frontend=frontend,
                    approx_snake=codec.approx_snake,
                    voc_dtype=codec.voc_dtype)
                return st, (codes, wav)
            st, (codes, wav) = jax.lax.scan(body, state, chunks)
            return st, codes, wav

        return chain

    def sync(v):
        return float(jax.tree.leaves(v)[0].sum())

    rng = np.random.default_rng(0)
    print(f"algorithmic budget {budget_ms:.1f} ms; packet hop "
          f"{fc.hop / codec.conf.fs * 1e3:.1f} ms", flush=True)
    print(f"{'k':>3} {'host ms/pkt':>12} {'added latency ms':>17} "
          f"{'pkt/s/dispatch-chain':>21}", flush=True)
    for k in (1, 2, 4, 8, 16):
        chain = make_chain(k)
        chunks = jnp.asarray(
            rng.standard_normal((k, B, fc.hop)).astype(np.float32) * 0.1)
        st = fc.state
        st2, codes, wav = chain(codec.bvrnn_params, codec.vocoder_params,
                                st, chunks, fc.bits)
        sync(wav)  # compile
        iters = max(4, 32 // k)
        t0 = time.perf_counter()
        for _ in range(iters):
            _, codes, wav = chain(codec.bvrnn_params, codec.vocoder_params,
                                  st, chunks, fc.bits)
            sync(wav)  # per-dispatch sync: this IS the daemon's tick pattern
        per_pkt_ms = (time.perf_counter() - t0) / iters / k * 1e3
        added_ms = (k - 1) * fc.hop / codec.conf.fs * 1e3
        print(f"{k:>3} {per_pkt_ms:>12.2f} {added_ms:>17.1f} "
              f"{1e3 / per_pkt_ms:>21.0f}", flush=True)


if __name__ == "__main__":
    main()
