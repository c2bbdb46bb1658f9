"""Corpus-generator styles (scripts/make_synthetic_corpus.py): every
style must render finite, normalized, non-silent audio so the datasets'
silence-rejection startup audit (reference datasets.py:145-160 analogue)
accepts the generated corpora."""

import importlib.util
import os

import numpy as np
import pytest

_PATH = os.path.join(
    os.path.dirname(__file__), "..", "scripts", "make_synthetic_corpus.py"
)
_spec = importlib.util.spec_from_file_location("make_synthetic_corpus", _PATH)
_MOD = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_MOD)


@pytest.mark.parametrize("style", sorted(_MOD.STYLES))
def test_style_renders_usable_audio(style):
    rng = np.random.default_rng(7)
    n = 3 * 44100
    audio = _MOD.STYLES[style](rng, n, 120)
    assert audio.shape == (n,)
    assert audio.dtype == np.float32
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() == pytest.approx(0.7, abs=1e-3)
    # windowed energy comfortably above the datasets' silence threshold
    # (configs use silence_threshold_energy 1e-6 over ~2048-sample wins)
    win = audio[: len(audio) // 2048 * 2048].reshape(-1, 2048)
    energies = (win**2).sum(axis=-1)
    assert float(np.median(energies)) > 1e-4


def test_styles_are_deterministic_per_seed():
    a = _MOD.STYLES["keys"](np.random.default_rng(3), 44100, 100)
    b = _MOD.STYLES["keys"](np.random.default_rng(3), 44100, 100)
    np.testing.assert_array_equal(a, b)
