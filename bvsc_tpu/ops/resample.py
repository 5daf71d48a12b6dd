"""Alias-free resampling: kaiser-windowed sinc low-pass, 2x up/down sampling.

Capability-parity re-creation of the reference's vendored alias-free-torch
(``third_party/BigVGAN/alias_free_torch/{filter,resample,act}.py``).  The
shipped configs construct but *disable* these (``layers_antialias=[false]``,
``antialias_post=false``, reference ``configs/config_varBitRate.toml:51-52``)
because anti-aliasing breaks causality — we keep them for full parity and
for training non-causal variants.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from bvsc_tpu.ops.conv import DEFAULT_PRECISION, conv1d, conv_transpose1d, pad1d


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass, shape (1, 1, kernel_size)
    (reference ``alias_free_torch/filter.py:28-57``)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros((1, 1, kernel_size), np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()  # unity DC gain
    return filt.reshape(1, 1, kernel_size).astype(np.float32)


class LowPassFilter1d:
    """(reference ``filter.py:60-94``)"""

    def __init__(self, cutoff=0.5, half_width=0.6, stride=1, padding=True,
                 padding_mode="edge", kernel_size=12):
        if not 0.0 <= cutoff <= 0.5:
            raise ValueError("cutoff must be in [0, 0.5]")
        self.kernel_size = kernel_size
        even = kernel_size % 2 == 0
        self.pad_left = kernel_size // 2 - int(even)
        self.pad_right = kernel_size // 2
        self.stride = stride
        self.padding = padding
        self.padding_mode = padding_mode  # numpy 'edge' == torch 'replicate'
        self.filter = jnp.asarray(kaiser_sinc_filter1d(cutoff, half_width, kernel_size))

    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[1]
        if self.padding:
            x = pad1d(x, self.pad_left, self.pad_right, mode=self.padding_mode)
        w = jnp.broadcast_to(self.filter, (C, 1, self.kernel_size))
        return conv1d(x, {"w": w, "b": None}, stride=self.stride, groups=C)


class UpSample1d:
    """Zero-stuffing + sinc interpolation (reference ``resample.py:10-35``)."""

    def __init__(self, ratio=2, kernel_size=None):
        self.ratio = ratio
        self.kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        self.stride = ratio
        self.pad = self.kernel_size // ratio - 1
        self.pad_left = self.pad * self.stride + (self.kernel_size - self.stride) // 2
        self.pad_right = self.pad * self.stride + (self.kernel_size - self.stride + 1) // 2
        self.filter = jnp.asarray(
            kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[1]
        x = pad1d(x, self.pad, self.pad, mode="edge")
        w = jnp.broadcast_to(self.filter, (C, 1, self.kernel_size))
        # grouped transposed conv: run per-channel via feature grouping
        k = self.kernel_size
        w_flip = jnp.flip(w, axis=-1)  # depthwise: (C,1,K) OIH with groups=C
        y = jax.lax.conv_general_dilated(
            x, w_flip,
            window_strides=(1,),
            padding=[(k - 1, k - 1)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=C,
            precision=DEFAULT_PRECISION,
        )
        y = self.ratio * y
        return y[..., self.pad_left : y.shape[-1] - self.pad_right]


class DownSample1d:
    """(reference ``resample.py:38-48``)"""

    def __init__(self, ratio=2, kernel_size=None):
        kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        self.lowpass = LowPassFilter1d(
            cutoff=0.5 / ratio, half_width=0.6 / ratio, stride=ratio,
            kernel_size=kernel_size,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.lowpass(x)


class Activation1d:
    """up2 -> activation -> down2 (reference ``act.py:8-27``)."""

    def __init__(self, activation, up_ratio=2, down_ratio=2,
                 up_kernel_size=12, down_kernel_size=12):
        self.act = activation
        self.upsample = UpSample1d(up_ratio, up_kernel_size)
        self.downsample = DownSample1d(down_ratio, down_kernel_size)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.downsample(self.act(self.upsample(x)))
