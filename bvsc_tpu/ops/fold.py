"""Space-to-depth time folding: make tiny-channel convs MXU-shaped.

The causal vocoder's residual stacks run at 8-64 channels over very long
time axes (reference tiny-BigVGAN channels 128->8,
``configs/config_varBitRate.toml:47``).  On the MXU (128x128 systolic
array) an 8x8-channel conv uses <1% of the array.  Folding time into
channels — x' [j*C + c, t'] = x[c, t'*s + j] — turns a causal conv
(C_in -> C_out, kernel k, dilation d) into an exactly-equivalent causal
conv (C_in*s -> C_out*s, kernel D+1 = ceil((k-1)*d/s)+1, dilation 1) whose
contraction dimension fills the MXU.  Dense FLOPs grow by ~s*(D+1)/k.

MEASURED RESULT (v5e, B=128): the folded generator is ~15% SLOWER than
XLA's direct convolution (203 ms vs 176 ms full-generator) — XLA's conv
lowering already blocks the time axis well enough that the extra dense
FLOPs don't pay.  Kept as an optional, exactly-equivalent path
(``models.vocoder.generator_apply_folded``); the default fast path remains
the direct conv.

Elementwise ops (Snake) and residual adds commute with folding: per-channel
parameters are tiled s times.  Strictly a layout/algebra transform — outputs
are bit-equivalent up to f32 summation order.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def fold_time(x: jax.Array, s: int) -> jax.Array:
    """(B, C, T) -> (B, C*s, T//s); requires T % s == 0.

    Folded channel index is j*C + c for original channel c, sub-step j.
    """
    if s == 1:
        return x
    B, C, T = x.shape
    assert T % s == 0, (T, s)
    return x.reshape(B, C, T // s, s).transpose(0, 3, 1, 2).reshape(B, s * C, T // s)


def unfold_time(x: jax.Array, s: int) -> jax.Array:
    """Inverse of :func:`fold_time`."""
    if s == 1:
        return x
    B, SC, Tp = x.shape
    C = SC // s
    return x.reshape(B, s, C, Tp).transpose(0, 2, 3, 1).reshape(B, C, Tp * s)


def fold_conv_weight(
    w: np.ndarray, dilation: int, s: int
) -> tuple[np.ndarray, int]:
    """Causal conv weight (O, I, k) with dilation d -> folded weight
    (O*s, I*s, D+1) with dilation 1, D = ceil((k-1)*d / s).

    Folded semantics (matching fold_time's channel packing, after a left
    zero-pad of D folded steps):
      y[o, t*s + j] = sum_{c,i} w[o,c,i] * x[c, t*s + j - (k-1-i)*d]
    """
    w = np.asarray(w)
    O, I, k = w.shape
    D = int(np.ceil((k - 1) * dilation / s)) if k > 1 else 0
    wf = np.zeros((O * s, I * s, D + 1), w.dtype)
    for j in range(s):
        for i in range(k):
            u = j - (k - 1 - i) * dilation
            t_off = u // s  # floor division (u may be negative)
            jj = u - t_off * s  # u mod s, in [0, s)
            delta = -t_off  # folded-steps back in time, >= 0
            m = D - delta
            assert 0 <= jj < s and 0 <= delta <= D, (j, i, u, delta)
            wf[j * O : (j + 1) * O, jj * I : (jj + 1) * I, m] += w[:, :, i]
    return wf, D


def fold_channel_param(p: np.ndarray, s: int) -> np.ndarray:
    """Per-channel vector (C,) -> (C*s,) tiled to the folded packing."""
    return np.tile(np.asarray(p), s)
