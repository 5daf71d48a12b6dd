"""Golden parity tests for the mel/STFT frontend vs torch.stft.

The reference frontend is ``third_party/BigVGAN/meldataset.py:60-95``; we
replicate its exact torch math inline here (reflect pad -> torch.stft
center=False -> sqrt(+1e-9) -> mel matmul -> log clamp 1e-5) and check our
JAX frontend against it on random signals.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from bvsc_tpu.ops.mel import (
    MelFrontend,
    hann_window_periodic,
    slaney_mel_filterbank,
    mel_spectrogram,
)

FS, NFFT, HOP, NMELS, FMIN, FMAX, PADL = 22050, 1024, 256, 80, 0.0, 8000.0, 256


def torch_reference_logmel(y_np, padding_left=PADL, fmax=FMAX):
    """Reference mel pipeline (meldataset.py:60-95) in torch, using our
    numpy Slaney filterbank in place of librosa.filters.mel."""
    y = torch.from_numpy(y_np).float()
    pl = padding_left
    pr = NFFT - pl - HOP
    y = torch.nn.functional.pad(y.unsqueeze(1), (pl, pr), mode="reflect").squeeze(1)
    window = torch.hann_window(NFFT)
    stft = torch.stft(
        y, NFFT, hop_length=HOP, win_length=NFFT, window=window,
        center=False, normalized=False, onesided=True, return_complex=True,
    )
    spec = torch.view_as_real(stft)
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(slaney_mel_filterbank(FS, NFFT, NMELS, FMIN, fmax))
    mel = torch.matmul(fb, spec)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


@pytest.mark.parametrize("use_matmul_dft", [False, True])
def test_logmel_matches_torch(rng, use_matmul_dft):
    y = rng.standard_normal((2, 22050)).astype(np.float32) * 0.3
    ref = torch_reference_logmel(y)
    fe = MelFrontend(use_matmul_dft=use_matmul_dft)
    got = np.asarray(fe(jnp.asarray(y)))
    assert got.shape == ref.shape == (2, 80, ref.shape[2])
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_frame_count():
    fe = MelFrontend()
    # reference: padded length L + 768, frames = 1 + (L + 768 - 1024)//256
    for L in [22050, 4 * 22050, 256 * 10]:
        y = jnp.zeros((1, L))
        assert fe(y).shape[2] == fe.num_frames(L) == 1 + (L + 768 - 1024) // 256


def test_functional_api_matches_reference_signature(rng):
    y = rng.standard_normal((1, 8192)).astype(np.float32) * 0.1
    out = mel_spectrogram(
        jnp.asarray(y), n_fft=NFFT, num_mels=NMELS, sampling_rate=FS,
        hop_size=HOP, win_size=NFFT, fmin=FMIN, fmax=FMAX, padding_left=PADL,
    )
    ref = torch_reference_logmel(y)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


def test_symmetric_padding_mode(rng):
    # padding_left=-1 selects symmetric (n_fft-hop)/2 padding (meldataset.py:72-75)
    y = rng.standard_normal((1, 8192)).astype(np.float32) * 0.1
    fe = MelFrontend(padding_left=-1)
    assert fe.pad_left == fe.pad_right == (NFFT - HOP) // 2
    ref = torch_reference_logmel(y, padding_left=(NFFT - HOP) // 2)
    np.testing.assert_allclose(np.asarray(fe(jnp.asarray(y))), ref, atol=2e-4, rtol=1e-4)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window_periodic(1024), torch.hann_window(1024).numpy(), atol=1e-6
    )


def test_mel_filterbank_properties():
    fb = slaney_mel_filterbank(FS, NFFT, NMELS, FMIN, FMAX)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support, and bins above fmax get (near-)zero weight
    assert (fb.sum(axis=1) > 0).all()
    fftfreqs = np.linspace(0, FS / 2, 513)
    assert fb[:, fftfreqs > FMAX + 50].sum() == 0
    # Slaney normalisation => approximately constant filter area
    areas = fb.sum(axis=1) * (FS / 2 / 512)
    assert areas.std() / areas.mean() < 0.25
