"""Polyphase resampler tests (ops/resample.py) against a direct-form
float64 oracle and signal-level invariants.

The reference resamples with torchaudio's windowed-sinc `Resample`
(`scripts/split_datasets.py`, `scripts/resample.py`); ours documents the
same construction (Hann-windowed sinc, rolloff 0.99, width 6) so the
oracle below recomputes each output sample straight from that formula —
independently of the polyphase machinery under test.
"""

import math

import numpy as np
import pytest

from mod_extraction_tpu.ops.resample import LOWPASS_FILTER_WIDTH, ROLLOFF, resample


def _naive_resample(x: np.ndarray, orig: int, new: int) -> np.ndarray:
    """Direct per-output-sample evaluation of the documented kernel."""
    g = math.gcd(orig, new)
    og, ng = orig // g, new // g
    fc = ROLLOFF * min(og, ng) / og / 2.0
    w = int(math.ceil(LOWPASS_FILTER_WIDTH / (2.0 * fc)))
    t_len = x.shape[-1]
    n_out = int(math.ceil(t_len * ng / og))
    out = np.zeros(n_out, np.float64)
    xd = x.astype(np.float64)
    for j in range(n_out):
        tau = j * og / ng
        n0 = math.floor(tau)
        frac = tau - n0
        acc = 0.0
        for k in range(-w, w + 1):
            idx = n0 + k
            if not (0 <= idx < t_len):
                continue  # fast path zero-pads outside the signal
            t = k - frac
            xx = 2.0 * math.pi * fc * t
            sinc = 1.0 if abs(xx) < 1e-12 else math.sin(xx) / xx
            win = math.cos(max(-1.0, min(1.0, t / w)) * math.pi / 2.0) ** 2
            acc += 2.0 * fc * sinc * win * xd[idx]
        out[j] = acc
    return out


@pytest.mark.parametrize("orig,new", [(4, 3), (3, 4), (44100, 48000), (48000, 16000)])
def test_matches_direct_form(rng, orig, new):
    x = rng.standard_normal(400).astype(np.float32)
    ours = resample(x, orig, new)
    ref = _naive_resample(x, orig, new)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_identity_and_shapes(rng):
    x = rng.standard_normal((2, 3, 100)).astype(np.float32)
    same = resample(x, 44100, 44100)
    np.testing.assert_array_equal(same, x)
    up = resample(x, 22050, 44100)
    assert up.shape == (2, 3, 200)
    down = resample(x, 44100, 22050)
    assert down.shape == (2, 3, 50)


def test_tone_survives_rate_conversion():
    """A 1 kHz tone resampled 44.1k -> 48k keeps its frequency and
    amplitude (interior samples, away from filter edge effects)."""
    sr0, sr1, f0 = 44100, 48000, 1000.0
    t0 = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * f0 * t0).astype(np.float32)
    y = resample(x, sr0, sr1)
    t1 = np.arange(y.shape[-1]) / sr1
    expected = np.sin(2 * np.pi * f0 * t1)
    core = slice(200, -200)
    err = np.abs(y[core] - expected[core])
    assert err.max() < 5e-3


def test_dc_gain_is_unity():
    x = np.ones(1000, np.float32)
    y = resample(x, 3, 2)
    core = y[50:-50]
    np.testing.assert_allclose(core, 1.0, atol=2e-3)


def test_downsample_rejects_aliasing():
    """Content above the target Nyquist must be attenuated, not folded."""
    sr0, sr1 = 44100, 11025
    t = np.arange(sr0 // 4) / sr0
    x = np.sin(2 * np.pi * 10000.0 * t).astype(np.float32)  # > 5512.5 Hz
    y = resample(x, sr0, sr1)
    assert np.abs(y[50:-50]).max() < 0.05
