"""Multi-resolution STFT loss — JAX equivalent of
``auraloss.freq.MultiResolutionSTFTLoss`` defaults used by the reference
validation (``third_party/BigVGAN/train.py:161,194``):

  resolutions (n_fft, hop, win) = (1024,120,600), (2048,240,1200), (512,50,240)
  loss = mean over resolutions of [spectral convergence + log-magnitude L1]
  (Hann window, centered frames).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


@functools.lru_cache(maxsize=16)
def _hann(win: int) -> np.ndarray:
    n = np.arange(win, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2 * np.pi * n / win)).astype(np.float32)


def _stft_mag(x: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    """(B, T) -> (B, bins, frames) magnitude; centered (reflect) framing like
    torch.stft(center=True) which auraloss uses."""
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(num_frames)[:, None]
    frames = x[..., idx]
    wpad = (n_fft - win) // 2
    window = np.zeros(n_fft, np.float32)
    window[wpad : wpad + win] = _hann(win)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    mag = jnp.sqrt(
        jnp.clip(spec.real**2 + spec.imag**2, min=1e-12)
    )
    return jnp.swapaxes(mag, -1, -2)


def stft_loss(x: jax.Array, y: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    """Single-resolution: spectral convergence + log magnitude L1."""
    X = _stft_mag(x, n_fft, hop, win)
    Y = _stft_mag(y, n_fft, hop, win)
    sc = jnp.linalg.norm(Y - X) / jnp.maximum(jnp.linalg.norm(Y), 1e-8)
    log_mag = jnp.mean(jnp.abs(jnp.log(Y) - jnp.log(X)))
    return sc + log_mag


def multi_resolution_stft_loss(
    x: jax.Array, y: jax.Array, resolutions=DEFAULT_RESOLUTIONS
) -> jax.Array:
    """x: generated (B, T), y: target (B, T)."""
    losses = [stft_loss(x, y, *r) for r in resolutions]
    return sum(losses) / len(losses)
