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


def snake(x: jax.Array, p: dict, *, logscale: bool) -> jax.Array:
    """x: (B, C, T); p['alpha']: (C,)."""
    alpha = p["alpha"][None, :, None]
    if logscale:
        alpha = jnp.exp(alpha)
    s = jnp.sin(x * alpha)
    return x + (1.0 / (alpha + _EPS)) * (s * s)


def snake_beta(x: jax.Array, p: dict, *, logscale: bool) -> jax.Array:
    """x: (B, C, T); p['alpha'], p['beta']: (C,)."""
    alpha = p["alpha"][None, :, None]
    beta = p["beta"][None, :, None]
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    s = jnp.sin(x * alpha)
    return x + (1.0 / (beta + _EPS)) * (s * s)


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


def apply_activation(x: jax.Array, p: dict, *, kind: str, logscale: bool) -> jax.Array:
    if kind == "snake":
        return snake(x, p, logscale=logscale)
    if kind == "snakebeta":
        return snake_beta(x, p, logscale=logscale)
    if kind == "lrelu":
        return leaky_relu(x)
    raise NotImplementedError(f"activation {kind!r}")
