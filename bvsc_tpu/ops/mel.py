"""Log-mel spectrogram frontend, pure JAX (XLA-compiled, TPU-first).

Numerically matches the reference frontend
(``third_party/BigVGAN/meldataset.py:60-95``):

  asymmetric reflect pad (left ``padding_left``, right ``win - left - hop``)
  -> framed STFT (Hann *periodic* window, center=False, onesided)
  -> magnitude ``sqrt(re^2 + im^2 + 1e-9)``
  -> librosa-compatible Slaney mel filterbank matmul
  -> ``log(clamp(x, 1e-5))`` dynamic-range compression.

The mel filterbank is re-derived from the Slaney formulae in plain numpy
(librosa is not a dependency); it is bit-compatible with
``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)`` defaults
(htk=False, norm='slaney').

TPU design notes: framing is a static gather; the DFT can run either through
XLA's FFT or as two real matmuls against precomputed DFT bases — the matmul
path rides the MXU and fuses with the mel projection, which is the faster
option for small batch counts on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "slaney_mel_filterbank",
    "hann_window_periodic",
    "MelFrontend",
    "mel_spectrogram",
    "stft_magnitude",
    "dynamic_range_compression",
]


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney (Auditory Toolbox) Hz->mel: linear below 1 kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region,
        min_log_hz * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)),
        freqs,
    )
    return freqs


def slaney_mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, 1 + n_fft//2), float32.

    Matches ``librosa.filters.mel`` defaults (Slaney scale + Slaney area
    normalisation), which the reference uses
    (``third_party/BigVGAN/meldataset.py:68``).
    """
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2, dtype=np.float64)
    mel_min, mel_max = _hz_to_mel_slaney(np.array([fmin, fmax]))
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style area normalisation.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window_periodic(win_size: int) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(win_size)``."""
    n = np.arange(win_size, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(np.float32)


def dynamic_range_compression(x: jax.Array, clip_val: float = 1e-5) -> jax.Array:
    """``log(clamp(x, 1e-5))`` (reference ``meldataset.py:38-39,46-48``)."""
    return jnp.log(jnp.clip(x, min=clip_val))


def _frame(y: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """(B, L) -> (B, F, n_fft) with F = 1 + (L - n_fft)//hop (center=False).

    Uses XLA's native patch extraction (conv machinery) rather than a gather:
    the backward pass is then a conv too, which compiles fast and small —
    the gather formulation's scatter-add backward blows up TPU AOT
    compilation inside GAN losses.
    """
    patches = jax.lax.conv_general_dilated_patches(
        y[:, None, :],
        filter_shape=(n_fft,),
        window_strides=(hop,),
        padding="VALID",
        # the identity conv must not round values through bf16 passes
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, n_fft, F)
    return jnp.swapaxes(patches, -1, -2)


def _pad_reflect(y: jax.Array, pad_left: int, pad_right: int) -> jax.Array:
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad_left, pad_right)], mode="reflect")


def stft_magnitude(
    y: jax.Array,
    n_fft: int,
    hop_size: int,
    window: jax.Array,
    *,
    eps: float = 1e-9,
    use_matmul_dft: bool = False,
    dft_bases: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """Framed STFT magnitude ``sqrt(re^2 + im^2 + eps)``, shape (B, n_bins, F).

    ``y`` must already be padded (center=False semantics, reference
    ``meldataset.py:84-87``).
    """
    frames = _frame(y, n_fft, hop_size) * window  # (B, F, n_fft)
    if use_matmul_dft:
        if dft_bases is None:
            dft_bases = dft_real_bases(n_fft)
        cos_b, sin_b = dft_bases
        re = jnp.matmul(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
        mag = jnp.sqrt(re * re + im * im + eps)
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        mag = jnp.sqrt(spec.real**2 + spec.imag**2 + eps)
    return jnp.swapaxes(mag, -1, -2)  # (B, n_bins, F)


@functools.lru_cache(maxsize=8)
def _dft_real_bases_np(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(1 + n_fft // 2)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def dft_real_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases (n_fft, 1+n_fft//2) for the matmul-DFT path (MXU).

    Kept as HOST numpy arrays: traced jit programs embed captured constants
    by value, and a device-resident constant costs a device->host readback
    per trace (~seconds over this environment's 30 MB/s tunnel, paid at
    every process start before the compile cache can even be consulted)."""
    return _dft_real_bases_np(n_fft)


class MelFrontend:
    """Precomputed-constant log-mel frontend.

    Equivalent to reference ``mel_spectrogram(...)`` with its module-level
    ``mel_basis``/``hann_window`` caches (``meldataset.py:56-57,60-95``), but
    as an explicit object whose ``__call__`` is a pure jittable function.
    """

    def __init__(
        self,
        sampling_rate: int = 22050,
        n_fft: int = 1024,
        num_mels: int = 80,
        hop_size: int = 256,
        win_size: int | None = None,
        fmin: float = 0.0,
        fmax: float | None = 8000.0,
        padding_left: int = 256,
        use_matmul_dft: bool = True,
    ):
        win_size = n_fft if win_size is None else win_size
        if padding_left == -1:  # symmetric padding (reference meldataset.py:72-75)
            assert (n_fft - hop_size) % 2 == 0, "No symmetric padding possible"
            padding_left = (n_fft - hop_size) // 2
            self.pad_right = padding_left
        else:
            self.pad_right = win_size - padding_left - hop_size
        self.pad_left = padding_left
        self.n_fft = n_fft
        self.hop_size = hop_size
        self.win_size = win_size
        self.num_mels = num_mels
        self.use_matmul_dft = use_matmul_dft
        # host numpy constants — see dft_real_bases for why not jnp
        self.window = np.asarray(hann_window_periodic(win_size), np.float32)
        fb = slaney_mel_filterbank(
            sampling_rate, n_fft, num_mels, fmin, sampling_rate / 2 if fmax is None else fmax
        )
        self.mel_basis = np.asarray(fb, np.float32)  # (n_mels, n_bins)
        self._dft = dft_real_bases(n_fft) if use_matmul_dft else None

    def num_frames(self, length: int) -> int:
        return 1 + (length + self.pad_left + self.pad_right - self.n_fft) // self.hop_size

    def __call__(self, y: jax.Array) -> jax.Array:
        """(B, L) waveform -> (B, num_mels, F) log-mel."""
        y = _pad_reflect(y, self.pad_left, self.pad_right)
        mag = stft_magnitude(
            y,
            self.n_fft,
            self.hop_size,
            self.window,
            use_matmul_dft=self.use_matmul_dft,
            dft_bases=self._dft,
        )
        mel = jnp.matmul(self.mel_basis, mag, precision=jax.lax.Precision.HIGHEST)
        return dynamic_range_compression(mel)

    def stft_and_mel(self, y: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Return (log_mel, stft_magnitude) — reference ``return_stft=True``."""
        y = _pad_reflect(y, self.pad_left, self.pad_right)
        mag = stft_magnitude(
            y,
            self.n_fft,
            self.hop_size,
            self.window,
            use_matmul_dft=self.use_matmul_dft,
            dft_bases=self._dft,
        )
        mel = jnp.matmul(self.mel_basis, mag, precision=jax.lax.Precision.HIGHEST)
        return dynamic_range_compression(mel), mag


def mel_spectrogram(
    y: jax.Array,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: float,
    padding_left: int,
) -> jax.Array:
    """Functional one-shot API mirroring reference ``mel_spectrogram``
    (``meldataset.py:60``). Returns (B, num_mels, F)."""
    frontend = MelFrontend(
        sampling_rate=sampling_rate,
        n_fft=n_fft,
        num_mels=num_mels,
        hop_size=hop_size,
        win_size=win_size,
        fmin=fmin,
        fmax=fmax,
        padding_left=padding_left,
    )
    return frontend(y)
