"""int8 vocoder-segment feasibility probe (VERDICT r4 #7) — adopt or reject.

The batched vocoder runs at ~1.0x of the measured stream ceiling (XLA
cost_analysis bytes vs same-run ceiling, BENCH_r04), i.e. it is
byte/element-bound, and the r3 bf16 segment paid off by raising moved
elements/s.  The next candidate step is int8.  Three measurements decide:

  1. element-rate ceilings by dtype (f32 / bf16 / int8), via a chained
     elementwise kernel (xor for int8, tanh-free so the comparison is pure
     data movement) — does int8 raise elements/s at all on this chip, or
     is streaming element-rate-bound regardless of width?
  2. conv micro at real vocoder shapes: the widest generator stage conv in
     f32 / bf16 / int8 (preferred_element_type=int32) — does XLA lower an
     int8 conv to something faster than the bf16 one?
  3. context: the snake activations are ~80% of generator time
     (probe_voc_ops) and are transcendental — they cannot run in int8.
     Amdahl caps any int8-conv win at the conv share.

Run: python benchmarks/probe_voc_int8.py
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
    from jax import lax

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

    reps = 32
    n_bytes = 256 * 1024 * 1024

    # --- 1. element-rate ceilings by dtype ---------------------------------
    print("\n[1] element-rate ceilings (chained elementwise, one dispatch):")
    rates = {}
    for name, dtype, mk in (
        ("f32", jnp.float32, lambda n: jnp.ones((n,), jnp.float32)),
        ("bf16", jnp.bfloat16, lambda n: jnp.ones((n,), jnp.bfloat16)),
        ("int8", jnp.int8, lambda n: jnp.ones((n,), jnp.int8)),
    ):
        itemsize = jnp.dtype(dtype).itemsize
        n = n_bytes // itemsize
        big = mk(n)

        if dtype == jnp.int8:
            @jax.jit
            def chain(x):
                # xor with a loop-variant mask: pure read+write, cannot be
                # hoisted or algebraically collapsed
                def body(i, v):
                    return v ^ i.astype(jnp.int8)
                return lax.fori_loop(0, reps, body, x).sum(dtype=jnp.int32)
        else:
            @jax.jit
            def chain(x):
                def body(i, v):
                    return v * 0.9999999 + 1e-7
                return lax.fori_loop(0, reps, body, x).sum()

        t = tmin(chain, big)
        gelems = reps * n / t / 1e9
        gbps = gelems * 2 * itemsize  # read+write
        rates[name] = gelems
        print(f"  {name:5s}: {gelems:7.1f} Gelem/s  ({gbps:6.1f} GB/s)",
              flush=True)
    print(f"  int8/bf16 element-rate ratio: "
          f"{rates['int8'] / rates['bf16']:.2f}x "
          f"(>1.5x needed for a worthwhile segment rewrite)", flush=True)

    # --- 2. conv micro at vocoder shapes -----------------------------------
    # the widest stage: channels 128, kernel 7, B=128, T=344*8 (after the
    # first two upsamples of the 4 s serving batch) — representative of
    # where generator conv FLOPs/bytes live
    print("\n[2] conv micro (B=128, C=128, k=7, T=2752):")
    B, C, T, K = 128, 128, 2752, 7
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    w_f = jnp.asarray(rng.standard_normal((C, C, K)).astype(np.float32) * 0.05)
    dn = lax.conv_dimension_numbers(x_f.shape, w_f.shape,
                                    ("NCH", "OIH", "NCH"))

    def conv(x, w, prefer=None):
        return lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=dn,
            preferred_element_type=prefer)

    t_f32 = tmin(jax.jit(lambda x, w: conv(x, w).sum()), x_f, w_f)
    x_h, w_h = x_f.astype(jnp.bfloat16), w_f.astype(jnp.bfloat16)
    t_bf16 = tmin(jax.jit(lambda x, w: conv(x, w).sum()), x_h, w_h)
    x_q = jnp.clip(x_f * 16, -127, 127).astype(jnp.int8)
    w_q = jnp.clip(w_f * 256, -127, 127).astype(jnp.int8)
    try:
        t_int8 = tmin(jax.jit(
            lambda x, w: conv(x, w, jnp.int32).sum()), x_q, w_q)
    except Exception as e:
        t_int8 = None
        print("  int8 conv failed to lower:", str(e)[:200], flush=True)
    gf = 2 * B * C * C * K * T / 1e9
    print(f"  f32:  {t_f32 * 1e3:7.2f} ms ({gf / t_f32:6.1f} GFLOP/s)")
    print(f"  bf16: {t_bf16 * 1e3:7.2f} ms ({gf / t_bf16:6.1f} GFLOP/s)")
    if t_int8 is not None:
        print(f"  int8: {t_int8 * 1e3:7.2f} ms ({gf / t_int8:6.1f} GFLOP/s)"
              f"  -> {t_bf16 / t_int8:.2f}x vs bf16", flush=True)

    # --- 3. verdict ---------------------------------------------------------
    conv_win = (t_int8 is not None and t_int8 < t_bf16)
    elem_win = rates["int8"] / rates["bf16"] > 1.5
    print("\n[3] verdict: snake (transcendental, not int8-able) is ~80% of "
          "generator time;")
    print(f"    int8 element rate win: {elem_win} "
          f"({rates['int8'] / rates['bf16']:.2f}x), "
          f"int8 conv win: {conv_win}")
    print("    ADOPT int8 segment" if (conv_win and elem_win) else
          "    REJECT int8 segment (gains bound by the non-int8-able "
          "snake share and the measured rates above)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
