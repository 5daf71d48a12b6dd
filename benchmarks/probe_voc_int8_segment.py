"""Segment-level follow-ups to probe_voc_int8 (VERDICT r4 #7 + #6).

[A] int8-STORED snake pass: the generator is ~80% snake (transcendental —
    must compute in float), and the passes are byte-bound (~530 GB/s at
    every dtype, probe_voc_int8).  int8 pays only if XLA fuses the
    int8->float->snake->int8 converts into ONE pass so the stored stream
    halves.  Measures snake at vocoder shapes with bf16-stored vs
    int8-stored activations, plus the quantization error.

[B] B=64 vocoder batch-padding mitigation: probe_b64_cliff showed XLA
    lowers the generator at B in [32, 64] to a program moving 3-6x the
    bytes (99-121 ms vs 42 ms at B=96/128).  Measures the same generator
    with the mel batch PADDED to 96/128 and the output sliced back —
    if padding wins, the codec can bucket the vocoder batch.

Run: python benchmarks/probe_voc_int8_segment.py
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
    print("devices:", jax.devices(), flush=True)

    def sync(v):
        return float(jax.tree.leaves(v)[0].sum())

    def time_fn(fn, *a, iters=5):
        sync(fn(*a))
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(iters)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / iters

    def tmin(fn, *a, tries=3):
        return min(time_fn(fn, *a) for _ in range(tries))

    # --- [A] int8-stored snake pass ----------------------------------------
    print("\n[A] snake pass, bf16-stored vs int8-stored "
          "(B=128, C=128, T=2752):", flush=True)
    B, C, T = 128, 128, 2752
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    alpha = jnp.asarray(np.abs(rng.standard_normal((C, 1))).astype(np.float32))

    def snake(v, a):
        return v + jnp.sin(a * v) ** 2 / a

    x16 = jnp.asarray(x).astype(jnp.bfloat16)

    @jax.jit
    def run_bf16(v, a):
        return snake(v.astype(jnp.bfloat16), a.astype(jnp.bfloat16))

    t_bf16 = tmin(run_bf16, x16, alpha)

    scale = float(np.abs(x).max() / 127.0)
    x8 = jnp.asarray(np.clip(x / scale, -127, 127).astype(np.int8))

    @jax.jit
    def run_int8(v, a):
        # int8-stored in, float compute in registers, int8-stored out —
        # pays only if XLA fuses the converts into one byte-bound pass
        f = v.astype(jnp.bfloat16) * jnp.bfloat16(scale)
        y = snake(f, a.astype(jnp.bfloat16))
        return jnp.clip(y * jnp.bfloat16(1.0 / scale), -127, 127
                        ).astype(jnp.int8)

    t_int8 = tmin(run_int8, x8, alpha)
    y_ref = np.asarray(run_bf16(x16, alpha), np.float32)
    y_q = np.asarray(run_int8(x8, alpha), np.float32) * scale
    err = float(np.abs(y_q - y_ref).mean() / (np.abs(y_ref).mean() + 1e-9))
    print(f"  bf16-stored: {t_bf16 * 1e3:7.2f} ms")
    print(f"  int8-stored: {t_int8 * 1e3:7.2f} ms -> "
          f"{t_bf16 / t_int8:.2f}x, mean rel err {err * 100:.2f}%", flush=True)

    # --- [B] B=64 batch-padding mitigation ---------------------------------
    print("\n[B] generator with vocoder-batch padding (4 s serving mels):",
          flush=True)
    from bvsc_tpu.codec import BVRNNCodecModel
    from bvsc_tpu.models import vocoder as voc_mod

    codec = BVRNNCodecModel(precision="default")
    vcfg = codec.conf.vocoder_config
    vp16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                        codec.vocoder_params)
    T_mel = 352
    gen_len = T_mel * codec.conf.hopsize
    for B_real in (32, 64):
        mel = jnp.asarray(rng.standard_normal(
            (B_real, vcfg.num_mels, T_mel)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def gen(vpar, m):
            return voc_mod.generator_apply(
                vpar, vcfg, m, gen_len, precision=codec.precision,
                approx_snake=codec.approx_snake)

        t_direct = tmin(jax.jit(gen), vp16, mel)
        for B_pad in (96, 128):
            @jax.jit
            def gen_padded(vpar, m, B_pad=B_pad):
                mp = jnp.pad(m, ((0, B_pad - m.shape[0]), (0, 0), (0, 0)))
                return gen(vpar, mp)[: m.shape[0]]

            t_pad = tmin(gen_padded, vp16, mel)
            print(f"  B={B_real}: direct {t_direct * 1e3:6.1f} ms, "
                  f"padded->{B_pad} {t_pad * 1e3:6.1f} ms "
                  f"({t_direct / t_pad:.2f}x)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
