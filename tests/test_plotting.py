"""Media/plotting smoke tests (utils/plotting.py) — the reference's
callback media surface (`mod_extraction/plotting.py`, `callbacks.py`):
every plot helper must produce a readable PNG (and WAV when asked)."""

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")

from mod_extraction_tpu.utils.plotting import (
    plot_mod_sig,
    plot_spectrogram,
    plot_waveforms_stacked,
)


def _png_ok(path):
    assert os.path.exists(path)
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(path) > 1000


def test_plot_spectrogram_with_audio(tmp_path, rng):
    audio = (rng.standard_normal(8192) * 0.1).astype(np.float32)
    path = plot_spectrogram(
        audio, "spec_test", title="t", sr=44100.0,
        save_dir=str(tmp_path), save_audio=True,
    )
    _png_ok(path)
    wav = os.path.join(str(tmp_path), "spec_test.wav")
    assert os.path.exists(wav)
    from mod_extraction_tpu.data.wav import wav_read

    y, sr = wav_read(wav)
    assert sr == 44100
    assert y.shape[-1] == 8192
    # fade-in/out applied (no clicks at the edges)
    assert abs(float(np.ravel(y)[0])) < 1e-3


def test_plot_mod_sig_overlay(tmp_path, rng):
    gt = rng.uniform(0, 1, 345).astype(np.float32)
    est = np.clip(gt + 0.05, 0, 1)
    _png_ok(plot_mod_sig(est, gt, save_name="mod", save_dir=str(tmp_path)))
    # estimate-only variant (no GT available)
    _png_ok(plot_mod_sig(est, None, save_name="mod_solo", save_dir=str(tmp_path)))


def test_plot_waveforms_stacked(tmp_path, rng):
    w = [(rng.standard_normal(4096) * 0.2).astype(np.float32) for _ in range(3)]
    _png_ok(
        plot_waveforms_stacked(
            w, ["dry", "wet", "wet_hat"], save_name="wf", save_dir=str(tmp_path)
        )
    )
    _png_ok(
        plot_waveforms_stacked(
            w[:1], ["only"], save_name="wf1", save_dir=str(tmp_path)
        )
    )
