"""Does Mosaic engage more MXUs for taller output tiles? And bf16 tanh bandwidth."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

def timeit(f, *a, n=20):
    r = f(*a); _ = float(jax.tree.leaves(r)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    _ = float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / n

rng = np.random.default_rng(0)
L = 1024
REPS = 64   # serial chain inside kernel to dominate overheads

def mk_kernel(M):
    def k(w_ref, x_ref, o_ref):
        # each dot depends on the previous accumulator through a cheap
        # scalar, so no CSE/loop-invariant pass can collapse the chain
        acc = jnp.zeros((M, x_ref.shape[1]), jnp.float32)
        x = x_ref[:, :]
        for i in range(REPS):
            s = (acc[0, 0] * 0.0 + 1.0).astype(x.dtype)
            acc += jax.lax.dot(w_ref[:, :] * s, x,
                               preferred_element_type=jnp.float32)
        o_ref[:, :] = acc
    return k

for M in (128, 256, 512):
    w = jnp.asarray(rng.standard_normal((M, 128)), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((128, L)), jnp.bfloat16)
    f = jax.jit(lambda w, x, M=M: pl.pallas_call(
        mk_kernel(M),
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
    )(w, x))
    t = timeit(f, w, x)
    flops = 2 * M * 128 * L * REPS
    print(f"M={M}: {t*1e6:8.1f} us -> {flops/t/1e12:6.1f} TFLOP/s", flush=True)

# grid-parallel version: does a gridded kernel pipeline across steps?
def k2(w_ref, x_ref, o_ref):
    o_ref[:, :] = jax.lax.dot(w_ref[:, :], x_ref[:, :],
                              preferred_element_type=jnp.float32)
NG = 64
wg = jnp.asarray(rng.standard_normal((128, 128)), jnp.bfloat16)
xg = jnp.asarray(rng.standard_normal((128, NG*512)), jnp.bfloat16)
fg = jax.jit(lambda w, x: pl.pallas_call(
    k2, grid=(NG,),
    in_specs=[pl.BlockSpec((128, 128), lambda i: (0, 0)),
              pl.BlockSpec((128, 512), lambda i: (0, i))],
    out_specs=pl.BlockSpec((128, 512), lambda i: (0, i)),
    out_shape=jax.ShapeDtypeStruct((128, NG*512), jnp.float32),
)(w, x))
t = timeit(fg, wg, xg)
print(f"gridded 128x128x512x{NG}: {t*1e6:8.1f} us -> {2*128*128*512*NG/t/1e12:6.1f} TFLOP/s", flush=True)

# tanh bandwidth f32 vs bf16 on aligned shapes
for dt, nb in ((jnp.float32, 4), (jnp.bfloat16, 2)):
    x = jnp.asarray(rng.standard_normal((128, 8, 88576)), dt)
    f = jax.jit(jnp.tanh)
    t = timeit(f, x, n=10)
    gb = 2 * x.size * nb / 1e9
    print(f"tanh {np.dtype(dt).name}: {t*1e3:6.2f} ms -> {gb/t:6.0f} GB/s", flush=True)
