"""Objective quality metrics used by the reference validation loop
(``third_party/BigVGAN/train.py:150-227``): L1 mel error, multi-resolution
STFT loss, PESQ-WB at 16 kHz (optional — skipped if the ``pesq`` package is
absent, which it is in this image).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from bvsc_tpu.ops.mel import MelFrontend
from bvsc_tpu.ops.stft_loss import multi_resolution_stft_loss


def mel_l1(frontend: MelFrontend, y: jnp.ndarray, y_hat: jnp.ndarray) -> float:
    """Mean |mel(y) - mel(y_hat)| (reference ``train.py:179-182``)."""
    return float(jnp.mean(jnp.abs(frontend(y) - frontend(y_hat))))


def mrstft(y_hat: jnp.ndarray, y: jnp.ndarray) -> float:
    """auraloss-style MRSTFT (reference ``train.py:161,194``)."""
    return float(multi_resolution_stft_loss(jnp.asarray(y_hat), jnp.asarray(y)))


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    ref, test = np.asarray(ref), np.asarray(test)
    err = ref - test
    return float(10 * np.log10((ref**2).mean() / max((err**2).mean(), 1e-20)))


def pesq_wb_16k(ref_22k: np.ndarray, test_22k: np.ndarray, fs: int = 22050):
    """PESQ wideband at 16 kHz (reference ``train.py:184-191``).  Returns
    None when the ``pesq`` package is unavailable."""
    try:
        from pesq import pesq as _pesq
    except ImportError:
        return None
    import scipy.signal

    ref16 = scipy.signal.resample_poly(np.asarray(ref_22k, np.float64), 16000, fs)
    test16 = scipy.signal.resample_poly(np.asarray(test_22k, np.float64), 16000, fs)
    to_i16 = lambda x: (np.clip(x, -1, 1) * 32768.0).astype(np.int16)
    return float(_pesq(16000, to_i16(ref16), to_i16(test16), "wb"))
