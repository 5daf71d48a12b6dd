"""B=64 batch-curve cliff diagnosis (VERDICT r4 #6).

BENCH_r04's batch curve jumped 1 703 -> 6 952 audio-s/s from B=64 to
B=128 — B=64 was SLOWER in absolute time (150 ms) than B=128 (74 ms).
This probe splits the fused chain at B in {32, 64, 96, 128, 256} into its
phases (encode program / decode-to-mel / standalone vocoder / fused chain)
and prints per-phase times + the compiled programs' cost_analysis bytes,
so the cliff's location (which phase, which batch) and cause (bad layout /
different fusion choice at small batch) become measurable.

Run: python benchmarks/probe_b64_cliff.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from bench import load_speech
    from bvsc_tpu.codec import BVRNNCodecModel
    from bvsc_tpu.models import vocoder as voc_mod

    print("devices:", jax.devices(), flush=True)
    codec = BVRNNCodecModel(precision="default")
    seconds, bitrate = 4.0, 3000

    def sync(v):
        return float(jax.tree.leaves(v)[0].sum())

    def time_fn(fn, *a, iters=5):
        sync(fn(*a))
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(iters)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / iters

    vcfg = codec.conf.vocoder_config
    vp16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                        codec.vocoder_params)

    for B in (32, 64, 96, 128, 256):
        x = jax.device_put(jnp.asarray(load_speech(seconds, B)))
        L = x.shape[1]
        t_chain = time_fn(lambda w: codec(w, bitrate), x)
        t_enc = time_fn(lambda w: codec.encode(w, bitrate), x)
        codes = codec.encode(x, bitrate)
        t_mel = time_fn(lambda c: codec.decode_to_mel(c), codes)
        mel16 = codec.decode_to_mel(codes).astype(jnp.bfloat16)
        t_frames = int(np.asarray(codes).shape[1])
        gen_len = t_frames * codec.conf.hopsize

        def gen_fn(vpar, m):
            return voc_mod.generator_apply(
                vpar, vcfg, m, gen_len, precision=codec.precision,
                approx_snake=codec.approx_snake)

        gen_jit = jax.jit(gen_fn)
        t_voc = time_fn(gen_jit, vp16, mel16)
        d = gen_jit.lower(vp16, mel16).compile().cost_analysis()
        d = d[0] if isinstance(d, (list, tuple)) else d
        voc_by = float(d.get("bytes accessed", 0.0))
        thr = B * seconds / t_chain
        print(f"B={B:3d}: chain {t_chain * 1e3:7.1f} ms ({thr:7.1f} a-s/s) "
              f"| enc {t_enc * 1e3:6.1f} | mel {t_mel * 1e3:6.1f} "
              f"| voc {t_voc * 1e3:6.1f} ms "
              f"({voc_by / t_voc / 1e9:5.1f} GB/s of "
              f"{voc_by / 1e9:.2f} GB)", flush=True)
        del x, codes, mel16


if __name__ == "__main__":
    sys.exit(main())
