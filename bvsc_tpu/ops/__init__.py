"""Pure-functional DSP / NN ops (JAX, XLA-compiled; Pallas where it pays)."""

from bvsc_tpu.ops.mel import (
    MelFrontend,
    mel_spectrogram,
    slaney_mel_filterbank,
    hann_window_periodic,
)

__all__ = [
    "MelFrontend",
    "mel_spectrogram",
    "slaney_mel_filterbank",
    "hann_window_periodic",
]
