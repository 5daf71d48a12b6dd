"""Batch-scaling + stale-negative re-verification probe (VERDICT r3 #1).

Measures, with dispatch-amortized timing (scalar-readback sync, warm jit):
  1. full-chain fast-mode throughput at B = 64/128/256/512 — the knee sets
     the serving default,
  2. int8 / int8_mixed scans at the larger batches (r2 concluded "int8 loses
     at B=128" on dispatch-understated probes — re-verify),
  3. the space-to-depth FOLDED generator vs direct at B=128 (r2: "folded
     slower" — re-verify under corrected methodology),
  4. bf16 vs f32 elementwise streaming (r2: "element-rate-bound, bf16 does
     not help" — re-verify with a fori_loop chain),
plus XLA cost_analysis (flops / bytes accessed) for the phase programs, the
measured denominators bench.py's roofline-utilization fields use.

Run: python benchmarks/probe_batch_scaling.py  (real TPU, ~10-20 min cold)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from bench import load_speech, measure_ceilings
    from bvsc_tpu.codec import BVRNNCodecModel

    print("devices:", jax.devices(), flush=True)

    def sync(v):
        return float(jax.tree.leaves(v)[0].sum())

    def time_fn(fn, *args, iters=5):
        sync(fn(*args))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / iters

    seconds, bitrate = 4.0, 3000

    # --- 4. bf16 vs f32 elementwise streaming (chained) ----------------------
    reps = 32
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        big = jnp.ones((64 * 1024 * 1024,), dt)

        @jax.jit
        def chain_tanh(x):
            return lax.fori_loop(0, reps, lambda _, v: jnp.tanh(v), x).sum()

        t = time_fn(chain_tanh, big, iters=3)
        gbps = reps * 2 * big.size * big.dtype.itemsize / t / 1e9
        gels = reps * big.size / t / 1e9
        print(f"tanh streaming {name}: {gbps:.1f} GB/s, {gels:.1f} Gelem/s",
              flush=True)

    # --- 1+2. batch scaling ---------------------------------------------------
    print("\nbatch scaling (full fused chain, fast mode):", flush=True)
    results = {}
    for B in (64, 128, 256, 512):
        x = jax.device_put(jnp.asarray(load_speech(seconds, B)))
        codec = BVRNNCodecModel(precision="default")
        t = time_fn(lambda w: codec(w, bitrate), x)
        thr = B * seconds / t
        results[("fast", B)] = thr
        print(f"  B={B:4d}: {t * 1e3:7.1f} ms -> {thr:8.1f} audio-s/s", flush=True)
        if B in (128, 256, 512):
            for q in ("int8", "int8_mixed"):
                cq = BVRNNCodecModel(precision="default", quantize=q)
                tq = time_fn(lambda w: cq(w, bitrate), x)
                thr_q = B * seconds / tq
                results[(q, B)] = thr_q
                print(f"  B={B:4d} {q}: {tq * 1e3:7.1f} ms -> "
                      f"{thr_q:8.1f} audio-s/s", flush=True)
        del x

    # --- 3. folded generator re-test at B=128 --------------------------------
    from bvsc_tpu.models import vocoder as voc_mod

    codec = BVRNNCodecModel(precision="default")
    B = 128
    x = jax.device_put(jnp.asarray(load_speech(seconds, B)))
    codes = codec.encode(x, bitrate)
    mel = codec.decode_to_mel(codes)
    vcfg = codec.conf.vocoder_config
    L = int(np.asarray(codes).shape[1]) * codec.conf.hopsize
    vp = codec.vocoder_params
    prec = codec.precision

    def direct(vpar, m):
        return voc_mod.generator_apply(vpar, vcfg, m, L, precision=prec,
                                       approx_snake=True)

    vp16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), vp)
    mel16 = mel.astype(jnp.bfloat16)
    t_direct = time_fn(jax.jit(direct), vp16, mel16)
    print(f"\ndirect generator bf16+approx B=128: {t_direct * 1e3:.1f} ms",
          flush=True)

    folded = voc_mod.prepare_folded_params(vp, vcfg)
    folded16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), folded)

    def run_folded(fp, m):
        return voc_mod.generator_apply_folded(fp, vcfg, m, L, precision=prec,
                                              approx_snake=True)

    t_folded = time_fn(jax.jit(run_folded), folded16, mel16)
    print(f"folded generator bf16+approx B=128: {t_folded * 1e3:.1f} ms",
          flush=True)

    # --- cost_analysis denominators for the bench phases ----------------------
    comp = jax.jit(direct).lower(vp16, mel16).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    print(f"generator cost_analysis: flops={ca.get('flops', 0):.3e} "
          f"bytes={ca.get('bytes accessed', 0):.3e}", flush=True)
    print(f"  -> at {t_direct * 1e3:.1f} ms: "
          f"{ca.get('flops', 0) / t_direct / 1e12:.1f} TFLOP/s, "
          f"{ca.get('bytes accessed', 0) / t_direct / 1e9:.1f} GB/s", flush=True)

    ceil = measure_ceilings(time_fn)
    print("ceilings:", ceil, flush=True)


if __name__ == "__main__":
    main()
