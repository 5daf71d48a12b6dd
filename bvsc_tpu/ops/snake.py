"""Snake periodic activations (reference ``third_party/BigVGAN/activations.py``).

Snake:     x + (1/(alpha+eps)) * sin^2(alpha * x)
SnakeBeta: x + (1/(beta +eps)) * sin^2(alpha * x)

with per-channel trainable alpha/beta, optionally stored in log scale
(the shipped configs use ``snakebeta`` + ``snake_logscale=true``,
reference ``configs/config_varBitRate.toml:55-56``).  Pure elementwise —
XLA fuses these into the surrounding convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9  # reference activations.py:46 no_div_by_zero

# sin(r) minimax-style odd polynomial on [-pi/2, pi/2] (Cephes sinf coeffs)
_PI = 3.14159265358979
_INV_PI = 1.0 / _PI
_S1, _S2, _S3 = -1.6666654611e-1, 8.3321608736e-3, -1.9515295891e-4


def sin_sq_approx(u: jax.Array) -> jax.Array:
    """Polynomial sin^2(u): period-pi range reduction + odd degree-7 sin poly.

    sin^2 has period pi, so r = u - pi*round(u/pi) lands in [-pi/2, pi/2]
    where the Cephes-style polynomial is accurate; max |err| vs f64 sin^2 is
    1.8e-4 over |u| < 300 (6.7e-5 on N(0,3) activations) — below bf16
    quantization noise.  Pure FMA pipeline: measured 140 Gelem/s f32 /
    238 Gelem/s bf16 vs 73 Gelem/s for transcendental jnp.sin on the
    virtualized v5e (benchmarks/probe_fast_snake.py), where snake is ~80%
    of direct-generator time.  Gradient is exact a.e. (round has zero
    cotangent, so dr/du = 1).
    """
    r = u - _PI * jnp.round(u * _INV_PI)
    r2 = r * r
    s = r + r * r2 * (_S1 + r2 * (_S2 + r2 * _S3))
    return s * s


def snake(x: jax.Array, p: dict, *, logscale: bool, approx: bool = False) -> jax.Array:
    """x: (B, C, T); p['alpha']: (C,)."""
    alpha = p["alpha"][None, :, None]
    if logscale:
        alpha = jnp.exp(alpha)
    ss = sin_sq_approx(x * alpha) if approx else jnp.square(jnp.sin(x * alpha))
    return x + (1.0 / (alpha + _EPS)) * ss


def snake_beta(x: jax.Array, p: dict, *, logscale: bool, approx: bool = False) -> jax.Array:
    """x: (B, C, T); p['alpha'], p['beta']: (C,)."""
    alpha = p["alpha"][None, :, None]
    beta = p["beta"][None, :, None]
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    ss = sin_sq_approx(x * alpha) if approx else jnp.square(jnp.sin(x * alpha))
    return x + (1.0 / (beta + _EPS)) * ss


def leaky_relu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    """LRELU_SLOPE=0.1 (reference models.py:23)."""
    return jax.nn.leaky_relu(x, slope)


def init_snake_params(channels: int, *, beta: bool, logscale: bool, dtype=jnp.float32) -> dict:
    """log scale -> zeros (exp()=1); linear scale -> ones
    (reference activations.py:39-42, 95-100)."""
    init = jnp.zeros if logscale else jnp.ones
    p = {"alpha": init((channels,), dtype)}
    if beta:
        p["beta"] = init((channels,), dtype)
    return p


def apply_activation(
    x: jax.Array, p: dict, *, kind: str, logscale: bool, approx: bool = False
) -> jax.Array:
    """approx: polynomial sin^2 (see :func:`sin_sq_approx`) — the fast
    serving path; ~2x snake throughput at <2e-4 abs error."""
    if kind == "snake":
        return snake(x, p, logscale=logscale, approx=approx)
    if kind == "snakebeta":
        return snake_beta(x, p, logscale=logscale, approx=approx)
    if kind == "lrelu":
        return leaky_relu(x)
    raise NotImplementedError(f"activation {kind!r}")
