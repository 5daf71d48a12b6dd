"""Per-phase compute profiling on the real chip (transfer-free, readback-synced).

NOTE: on the axon platform ``jax.block_until_ready`` does not reliably wait;
sync by reading back a scalar (``float(x.sum())``).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from bvsc_tpu.config import CodecConfig
from bvsc_tpu.models import bvrnn as M
from bvsc_tpu.models import vocoder as V


def timeit(f, *a, n=3):
    r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / n


def main():
    B, T = 128, 345
    L = T * 256
    conf = CodecConfig()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    variants = {
        "f32h": (jnp.float32, jax.lax.Precision.HIGHEST),
        "f32d": (jnp.float32, jax.lax.Precision.DEFAULT),
        "bf16": (jnp.bfloat16, jax.lax.Precision.DEFAULT),
    }
    for name, (dtype, prec) in variants.items():
        if which not in ("all", name):
            continue
        cfg = M.BVRNNConfig(dtype=dtype, precision=prec)
        params = M.init_bvrnn_params(jax.random.key(0), cfg)
        y = jax.device_put(
            jnp.asarray(np.random.default_rng(0).standard_normal((B, T, 80)), dtype)
        )
        bits = jnp.full((B, T), 35.0)
        h0 = jnp.zeros((B, cfg.h_dim), dtype)
        enc = jax.jit(M.encode_with_state, static_argnums=1)
        t0 = time.time()
        te = timeit(enc, params, cfg, y, bits, h0)
        print(f"{name}: encode {te*1e3:8.1f} ms (compile {time.time()-t0:.0f}s)",
              flush=True)
        codes, _ = enc(params, cfg, y, bits, h0)
        dec = jax.jit(M.decode, static_argnums=1)
        t0 = time.time()
        td = timeit(dec, params, cfg, codes, h0)
        print(f"{name}: decode {td*1e3:8.1f} ms (compile {time.time()-t0:.0f}s)",
              flush=True)

    if which in ("all", "voc"):
        vp = V.init_generator_params(jax.random.key(1), conf.vocoder_config,
                                     weight_norm=False)
        mel = jax.device_put(
            jnp.asarray(np.random.default_rng(1).standard_normal((B, 80, T)),
                        jnp.float32) - 5
        )
        voc = jax.jit(lambda p, m: V.generator_apply(p, conf.vocoder_config, m, L))
        t0 = time.time()
        tv = timeit(voc, vp, mel)
        print(f"voc : f32 {tv*1e3:8.1f} ms (compile {time.time()-t0:.0f}s)",
              flush=True)
        vpb = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vp)
        vocb = jax.jit(
            lambda p, m: V.generator_apply(p, conf.vocoder_config, m, L)
        )
        t0 = time.time()
        tvb = timeit(vocb, vpb, mel.astype(jnp.bfloat16))
        print(f"voc : bf16 {tvb*1e3:7.1f} ms (compile {time.time()-t0:.0f}s)",
              flush=True)
    print(f"[{B*T/86.133:.0f} audio-sec per batch]", flush=True)


if __name__ == "__main__":
    main()
