"""Fast sin^2 probe for the snake bottleneck (2026-08-19).

probe_voc_headroom.py showed snakebeta at 72.9 Gelem/s f32 (tanh: 141.5,
tanh bf16: 252) and ~18 snake passes per resblock stack -> ~143 ms of the
175 ms direct generator.  The transcendental sin is the cost.  Candidates:

1. builtin jnp.sin(u)**2 (baseline)
2. lax.sin(u, accuracy=...) relaxed-accuracy (JAX 0.9 API), if supported
3. range-reduced polynomial: sin^2 has period pi, so reduce
   r = u - pi*round(u/pi) (r in [-pi/2, pi/2]) and evaluate an odd
   degree-7 minimax poly for sin(r), then square.  Pure FMA pipeline.

Accuracy target: activations tolerate ~1e-4 abs easily (bf16 serving
already quantizes to ~3e-3 relative).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

rng = np.random.default_rng(0)
B = 128
shape = (B, 8, 88064)  # stage-4 serving shape from probe_voc_headroom

ALPHA = float(np.exp(0.5))
BETA_INV = float(np.exp(-1.0))

PI = float(np.pi)
INV_PI = float(1.0 / np.pi)
# minimax-ish odd poly for sin(r) on [-pi/2, pi/2] (Cephes-style, f32)
S1, S2, S3 = -1.6666654611e-1, 8.3321608736e-3, -1.9515295891e-4


def poly_sinsq(u):
    k = jnp.round(u * INV_PI)
    r = u - k * PI
    r2 = r * r
    s = r + r * r2 * (S1 + r2 * (S2 + r2 * S3))
    return s * s


def snake_builtin(x):
    s = jnp.sin(ALPHA * x)
    return x + BETA_INV * (s * s)


def snake_poly(x):
    return x + BETA_INV * poly_sinsq(ALPHA * x)


def make_snake_accuracy():
    """lax.sin relaxed accuracy, if this JAX/backend supports it."""
    tol = lax.Tolerance(atol=1e-5, rtol=1e-5, ulps=0)

    def f(x):
        s = lax.sin(ALPHA * x, accuracy=tol)
        return x + BETA_INV * (s * s)

    return f


def timeit(f, x, n=5, reps=32):
    @jax.jit
    def chain(v):
        return lax.fori_loop(0, reps, lambda _, u: f(u), v).sum()

    r = chain(x)
    _ = float(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = chain(x)
    _ = float(r)
    return (time.perf_counter() - t0) / n / reps


# --- accuracy check (host) -------------------------------------------------
u = np.concatenate([
    rng.standard_normal(200000) * 3,       # typical activations
    rng.standard_normal(20000) * 30,       # tail
    np.linspace(-100, 100, 20000),
]).astype(np.float32)
ref = np.sin(np.float64(ALPHA) * np.float64(u)) ** 2
got = np.asarray(jax.jit(poly_sinsq, backend="cpu")(jnp.asarray(ALPHA * u)))
err = np.abs(got - ref)
print(f"poly sin^2 max|err| (|u|<~300): {err.max():.3e}  mean {err.mean():.3e}",
      flush=True)

# --- throughput ------------------------------------------------------------
cands = [("builtin", snake_builtin), ("poly", snake_poly)]
try:
    f_acc = make_snake_accuracy()
    _ = jax.jit(f_acc)(jnp.ones((8, 8), jnp.float32))
    cands.append(("lax-accuracy", f_acc))
except Exception as e:
    print("lax.sin accuracy API unavailable:", str(e)[:140], flush=True)

for name, fn in cands:
    for dt, nb in ((jnp.float32, 4), (jnp.bfloat16, 2)):
        x = jnp.asarray(rng.standard_normal(shape), dt)
        t = timeit(fn, x)
        ge = 2 * x.size / 1e9
        print(f"snake[{name:12s}] {np.dtype(dt).name:8s}: {t*1e3:6.2f} ms/pass "
              f"-> {ge/t:6.1f} Gelem/s (r+w)", flush=True)

# --- device-side numeric agreement ------------------------------------------
x = jnp.asarray(rng.standard_normal(shape[1:]) * 3, jnp.float32)
a = np.asarray(jax.jit(snake_builtin)(x))
b = np.asarray(jax.jit(snake_poly)(x))
print(f"device snake poly-vs-builtin max|err|: {np.abs(a-b).max():.3e}",
      flush=True)
