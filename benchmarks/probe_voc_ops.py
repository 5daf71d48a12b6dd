import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
from bvsc_tpu.config import CodecConfig
from bvsc_tpu.models import vocoder as V
from bvsc_tpu.ops.conv import conv1d, pad1d
from bvsc_tpu.ops.snake import apply_activation

conf = CodecConfig(); vcfg = conf.vocoder_config
params = V.init_generator_params(jax.random.key(1), vcfg, weight_norm=False)
rng = np.random.default_rng(0)
B = 128
DEF = jax.lax.Precision.DEFAULT

def timeit(f, *a, n=10):
    r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / n

# stage 3: C=8, T=88614
C, T = 8, 88576
x = jax.device_put(jnp.asarray(rng.standard_normal((B, C, T)) * 0.3, jnp.float32))
blk = params["resblocks"][9]  # stage3, ksz=3
w11 = blk["convs1"][2]  # d=5
act = blk["acts"][0]

# single conv k=3 d=5
f_conv = jax.jit(lambda x, p: conv1d(pad1d(x, 10, 0), p, dilation=5, precision=DEF))
print("one conv k3d5 C8:", timeit(f_conv, x, blk["convs1"][2])*1e3, "ms", flush=True)
# single snake
f_snake = jax.jit(lambda x, a: apply_activation(x, a, kind=vcfg.activation, logscale=vcfg.snake_logscale))
print("one snake C8:", timeit(f_snake, x, act)*1e3, "ms", flush=True)
# snake+conv fused?
f_sc = jax.jit(lambda x, p, a: conv1d(pad1d(f_snake.__wrapped__(x, a) if hasattr(f_snake,'__wrapped__') else apply_activation(x, a, kind=vcfg.activation, logscale=vcfg.snake_logscale), 10, 0), p, dilation=5, precision=DEF))
print("snake+conv C8:", timeit(f_sc, x, blk["convs1"][2], act)*1e3, "ms", flush=True)
# elementwise only: tanh
f_t = jax.jit(lambda x: jnp.tanh(x))
print("one tanh C8:", timeit(f_t, x)*1e3, "ms", flush=True)
# same conv on folded dense 128ch layout
from bvsc_tpu.ops.fold import fold_time
xf = jax.device_put(fold_time(x, 16))  # (B, 128, T/16)
w = rng.standard_normal((128, 128, 4)).astype(np.float32)*0.05
pf = {"w": jnp.asarray(w), "b": jnp.zeros(128)}
f_dense = jax.jit(lambda x, p: conv1d(pad1d(x, 3, 0), p, dilation=1, precision=DEF))
print("dense conv 128ch k4:", timeit(f_dense, xf, pf)*1e3, "ms", flush=True)
