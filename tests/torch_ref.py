"""Helpers to import the READ-ONLY reference implementation for parity tests.

The reference at /root/reference is pure torch; ``meldataset.py`` imports
librosa (not installed here), so we inject a minimal stub backed by our own
numpy Slaney filterbank before importing reference modules.  Nothing from
the reference is copied into this repo — tests import it in place as the
golden oracle.
"""

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _install_librosa_stub():
    if "librosa" in sys.modules:
        return
    from bvsc_tpu.ops.mel import slaney_mel_filterbank

    librosa = types.ModuleType("librosa")
    filters = types.ModuleType("librosa.filters")
    util = types.ModuleType("librosa.util")

    def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
        fmax = sr / 2 if fmax is None else fmax
        return slaney_mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

    def normalize(S, norm=np.inf, axis=0, **kw):
        mag = np.abs(S).max()
        return S / mag if mag > 0 else S

    filters.mel = mel
    util.normalize = normalize
    librosa.filters = filters
    librosa.util = util
    sys.modules["librosa"] = librosa
    sys.modules["librosa.filters"] = filters
    sys.modules["librosa.util"] = util


def import_reference_bvrnn():
    """Import the reference BVRNN torch module (reference bvrnn.py)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import bvrnn as ref_bvrnn  # noqa

    return ref_bvrnn


def import_reference_bigvgan():
    """Import reference BigVGAN models.py (needs the librosa stub)."""
    _install_librosa_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    models = importlib.import_module("third_party.BigVGAN.models")
    env = importlib.import_module("third_party.BigVGAN.env")
    return models, env
