"""Vocoder headroom probe with dispatch-amortized timing (2026-08-19).

The 2026-08-17 probes timed one kernel per dispatch; through this
environment's tunnel each dispatch costs ~5-10 ms of host time, so every
few-ms measurement (tanh streaming, per-op costs, dtype comparisons) was
understated — bench.py's chained ceilings measure f32 streaming at
~486 GB/s, not the ~200 GB/s those probes recorded.  This probe re-answers
the serving-path questions with lax.fori_loop-chained kernels:

1. elementwise streaming: f32 vs bf16 tanh and snakebeta — byte-bound
   (bf16 2x) or element-bound (bf16 no win)?
2. the full direct generator, f32 vs bf16 params+activations (long enough
   programs that dispatch never mattered — re-run for a clean baseline).
3. per-stage chained resblock stacks — where the 190 ms goes.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from bvsc_tpu.config import CodecConfig
from bvsc_tpu.models import vocoder as V
from bvsc_tpu.models.vocoder import _amp_block

conf = CodecConfig()
vcfg = conf.vocoder_config
params = V.init_generator_params(jax.random.key(1), vcfg, weight_norm=False)
rng = np.random.default_rng(0)
B, T = 128, 344  # bench.py's 4 s @ 22.05 kHz serving shape
mel = jnp.asarray(rng.standard_normal((B, vcfg.num_mels, T)) - 5, jnp.float32)
L = T * 256
DEF = jax.lax.Precision.DEFAULT


def timeit(f, *a, n=5):
    r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / n


REPS = 32

# --- 1. elementwise rates, chained --------------------------------------
for name, fn in (
    ("tanh", jnp.tanh),
    ("snakebeta", lambda v: v + jnp.exp(-1.0) * jnp.sin(jnp.exp(0.5) * v) ** 2),
):
    for dt, nb in ((jnp.float32, 4), (jnp.bfloat16, 2)):
        x = jnp.asarray(rng.standard_normal((B, 8, 88064)), dt)  # stage-4 shape

        @jax.jit
        def chain(v, fn=fn):
            return lax.fori_loop(0, REPS, lambda _, u: fn(u), v).sum()

        t = timeit(chain, x)
        per_pass = t / REPS
        gb = 2 * x.size * nb / 1e9
        ge = 2 * x.size / 1e9
        print(f"{name:10s} {np.dtype(dt).name:8s}: {per_pass*1e3:6.2f} ms/pass "
              f"-> {gb/per_pass:6.0f} GB/s, {ge/per_pass:6.1f} Gelem/s (r+w)",
              flush=True)

# --- 2. full direct generator, f32 vs bf16 -------------------------------
f = jax.jit(lambda p, m: V.generator_apply(p, vcfg, m, L, precision=DEF))
t32 = timeit(f, params, mel)
print(f"direct generator f32 : {t32*1e3:7.1f} ms", flush=True)
pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
tbf = timeit(f, pbf, mel.astype(jnp.bfloat16))
print(f"direct generator bf16: {tbf*1e3:7.1f} ms", flush=True)
ref = np.asarray(f(params, mel), np.float32)
err = np.abs(np.asarray(f(pbf, mel.astype(jnp.bfloat16)), np.float32) - ref).max()
print(f"bf16 generator max |err| vs f32(default): {float(err):.3e}", flush=True)

# --- 3. per-stage resblock stacks, chained --------------------------------
num_k = len(vcfg.resblock_kernel_sizes)
for i in range(len(vcfg.upsample_rates)):
    ch = vcfg.upsample_initial_channel // (2 ** (i + 1))
    t_i = T
    for u in vcfg.upsample_rates[: i + 1]:
        t_i *= u
    for dt in (jnp.float32, jnp.bfloat16):
        blocks = [jax.tree.map(lambda a: a.astype(dt),
                               params["resblocks"][i * num_k + j])
                  for j in range(num_k)]
        x = jnp.asarray(rng.standard_normal((B, ch, t_i)) * 0.1, dt)

        def stack(xv, blocks=blocks, i=i):
            xs = None
            for j, (ksz, dil) in enumerate(zip(vcfg.resblock_kernel_sizes,
                                               vcfg.resblock_dilation_sizes)):
                out = _amp_block(xv, blocks[j], vcfg, ksz, dil,
                                 symmetric=False, antialias=False, precision=DEF)
                xs = out if xs is None else xs + out
            return xs / num_k

        nrep = 8

        @jax.jit
        def chain(xv):
            return lax.fori_loop(0, nrep, lambda _, u: stack(u), xv).sum()

        t = timeit(chain, x, n=3)
        elems = B * ch * t_i
        print(f"stage {i} (C={ch:3d}, T={t_i:6d}) {np.dtype(dt).name:8s}: "
              f"{t/nrep*1e3:6.1f} ms/stack  "
              f"({2*elems*np.dtype(dt).itemsize/ (t/nrep)/1e9:5.0f} GB/s if 1 r+w pass)",
              flush=True)

# --- 4. upsample (conv_transpose) costs, chained via shape trick ----------
for i, (u, k) in enumerate(zip(vcfg.upsample_rates, vcfg.upsample_kernel_sizes)):
    cin = vcfg.upsample_initial_channel // (2 ** i)
    cout = cin // 2
    t_i = T
    for uu in vcfg.upsample_rates[:i]:
        t_i *= uu
    x = jnp.asarray(rng.standard_normal((B, cin, t_i)) * 0.1, jnp.float32)
    up = params["ups"][i]

    fu = jax.jit(lambda xv: V.conv_transpose1d(xv, up, stride=u, precision=DEF).sum()
                 if hasattr(V, "conv_transpose1d") else None)
    try:
        from bvsc_tpu.ops.conv import conv_transpose1d

        fu = jax.jit(lambda xv: conv_transpose1d(xv, up, stride=u, precision=DEF).sum())
        t = timeit(fu, x)
        print(f"upsample {i} (C{cin}->{cout}, T{t_i}->{t_i*u}): {t*1e3:6.1f} ms "
              f"(single dispatch — includes ~5-10 ms host RTT)", flush=True)
    except Exception as e:
        print("upsample probe fail:", str(e)[:120], flush=True)
