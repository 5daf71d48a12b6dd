import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
from bvsc_tpu.config import CodecConfig
from bvsc_tpu.models import vocoder as V
from bvsc_tpu.ops import pallas_voc as PV

conf = CodecConfig(); vcfg = conf.vocoder_config
params = V.init_generator_params(jax.random.key(1), vcfg, weight_norm=False)
kb = PV.prepare_resblock_kernel_params(params, vcfg)
rng = np.random.default_rng(0)
num_k = 3
B = 128
PREC = jax.lax.Precision.DEFAULT

def timeit(f, *a, n=10):
    r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / n

def direct_stage(x, blocks_params, stage):
    xs = None
    for j, (ksz, dils) in enumerate(zip(vcfg.resblock_kernel_sizes, vcfg.resblock_dilation_sizes)):
        out = V._amp_block(x, blocks_params["resblocks"][stage*num_k + j], vcfg, ksz, dils,
                           False, False, precision=PREC)
        xs = out if xs is None else xs + out
    return xs / num_k

for stage, (C, T) in [(3, (8, 88614)), (1, (32, 22152)), (2, (16, 44306)), (0, (64, 2768))]:
    x = jax.device_put(jnp.asarray(rng.standard_normal((B, C, T)) * 0.3, jnp.float32))
    fd = jax.jit(lambda x, p: direct_stage(x, p, stage))
    td = timeit(fd, x, params)
    for cdt, name in [(jnp.bfloat16, "bf16")]:
        fp = jax.jit(lambda x, kb_: PV.resblock_stack_folded(
            x, kb_, vcfg, stage, block_len=1024, compute_dtype=cdt))
        tp = timeit(fp, x, kb)
        err = float(jnp.abs(fp(x, kb) - fd(x, params)).max())
        print(f"stage {stage} (C={C:3d}): direct {td*1e3:7.1f} ms | pallas[{name}] "
              f"{tp*1e3:7.1f} ms err={err:.1e}", flush=True)
