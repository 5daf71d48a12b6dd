import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
from bvsc_tpu.config import CodecConfig
from bvsc_tpu.models import vocoder as V

conf = CodecConfig(); vcfg = conf.vocoder_config
params = V.init_generator_params(jax.random.key(1), vcfg, weight_norm=False)
rng = np.random.default_rng(0)
B, T = 128, 347   # mel frames for 4s@22.05k
mel = jnp.asarray(rng.standard_normal((B, vcfg.num_mels, T)) - 5, jnp.float32)
L = T * 256
DEF = jax.lax.Precision.DEFAULT

def timeit(f, *a, n=10):
    r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / n

pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
melbf = mel.astype(jnp.bfloat16)

f32 = jax.jit(lambda p, m: V.generator_apply(p, vcfg, m, L, precision=DEF))
print("direct f32 :", timeit(f32, params, mel)*1e3, "ms", flush=True)
ref = np.asarray(f32(params, mel), np.float32)
print("direct bf16:", timeit(f32, pbf, melbf)*1e3, "ms", flush=True)
err = np.abs(np.asarray(f32(pbf, melbf), np.float32) - ref).max()
print("bf16 max err vs f32(default):", float(err), flush=True)
try:
    fold_p = V.prepare_folded_params(params, vcfg)
    ffold = jax.jit(lambda p, m: V.generator_apply_folded(p, vcfg, m, L, precision=DEF))
    print("folded f32 :", timeit(ffold, fold_p, mel)*1e3, "ms", flush=True)
    fold_pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype==jnp.float32 else a, fold_p)
    print("folded bf16:", timeit(ffold, fold_pbf, melbf)*1e3, "ms", flush=True)
except Exception as e:
    print("folded probe fail:", str(e)[:200], flush=True)
