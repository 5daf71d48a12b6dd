"""Self-contained PESQ-WB implementation (bvsc_tpu/eval/pesq.py).

No ITU conformance vectors or ``pesq`` wheel exist in this environment
(the module docstring documents the consequences), so the tests assert
the properties a perceptual quality metric must have — the same set
``scripts/validate_pesq.py`` checks on real MUSHRA speech, here on fast
synthetic signals — plus the committed validation artifact's invariants.
"""

import json
import os

import numpy as np
import pytest

from bvsc_tpu.eval.pesq import pesq_wb
from bvsc_tpu.eval.metrics import pesq_wb_16k

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "docs", "artifacts", "pesq_validation.json")


@pytest.fixture(scope="module")
def speechlike():
    """Synthetic speech-like signal: gliding harmonics with an envelope."""
    rng = np.random.default_rng(0)
    fs = 16000
    t = np.arange(fs * 2) / fs
    f0 = 120 + 40 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = sum(np.sin(k * phase) / k for k in range(1, 9))
    env = 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 2.3 * t), 0, 1)
    x = (x * env + 0.001 * rng.standard_normal(t.size)).astype(np.float64)
    return x / np.abs(x).max(), fs


def test_identical_hits_ceiling(speechlike):
    x, fs = speechlike
    assert pesq_wb(x, x, fs) > 4.6


def test_gain_invariance(speechlike):
    x, fs = speechlike
    base = pesq_wb(x, x, fs)
    assert abs(pesq_wb(x, 0.3 * x, fs) - base) < 0.05
    assert abs(pesq_wb(x, 2.0 * x, fs) - base) < 0.05


def test_awgn_monotone(speechlike):
    x, fs = speechlike
    rng = np.random.default_rng(1)
    prev = 5.0
    for snr in (40, 25, 10):
        noise = rng.standard_normal(x.size)
        noise *= np.sqrt((x ** 2).mean() / (noise ** 2).mean()) * 10 ** (-snr / 20)
        score = pesq_wb(x, x + noise, fs)
        assert score < prev, (snr, score, prev)
        prev = score
    assert prev < 2.5  # 10 dB SNR is plainly bad


def test_constant_delay_compensated(speechlike):
    """A pure 10 ms delay is not distortion (codec algorithmic delay)."""
    x, fs = speechlike
    delayed = np.concatenate([np.zeros(160), x])
    assert pesq_wb(x, delayed, fs) > 4.5


def test_silence_vs_speech_is_bad(speechlike):
    x, fs = speechlike
    assert pesq_wb(x, np.zeros_like(x) + 1e-6, fs) < 2.0


def test_metrics_hook_falls_back(speechlike):
    """pesq_wb_16k returns a float from the fallback (no wheel here)."""
    x, fs = speechlike
    import scipy.signal

    x22 = scipy.signal.resample_poly(x, 22050, fs)
    score = pesq_wb_16k(x22, x22)
    assert score is not None and score > 4.5


def test_validation_artifact_gates():
    """The committed real-speech validation artifact upholds its claims."""
    with open(ARTIFACT) as f:
        r = json.load(f)
    sl = r["signal_level"]
    assert sl["identical"] > 4.6
    snr_scores = [sl["awgn_by_snr"][k] for k in sorted(sl["awgn_by_snr"],
                                                       key=float)]
    assert snr_scores == sorted(snr_scores)  # monotone in SNR
    for fam, row in r["within_family"].items():
        assert row["agrees"], (fam, row)
    assert "cross_family_note" in r  # the negative result stays documented
