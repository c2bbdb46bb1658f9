"""LFO synthesis tests: closed-form checks + reference-semantics parity."""

import numpy as np
import pytest

from mod_extraction_tpu.ops.lfo import (
    LFO_SHAPES,
    make_mod_signal,
    make_mod_signal_batch,
    make_rand_mod_signal,
    shape_to_idx,
)


def _ref_mod_signal(n_samples, sr, freq, phase, shape, exp=1.0):
    """Independent numpy oracle for the reference LFO semantics
    (mod_extraction/modulations.py:16-57): argument[i] = 2*pi*f*(i+1)/sr
    + phase; rectified shapes halve freq and phase."""
    if shape in ("rect_cos", "inv_rect_cos"):
        freq, phase = freq / 2.0, phase / 2.0
    arg = 2 * np.pi * freq * np.arange(1, n_samples + 1) / sr + phase
    saw = np.mod(arg, 2 * np.pi) / (2 * np.pi)
    if shape == "cos":
        y = (np.cos(arg + np.pi) + 1) / 2
    elif shape == "rect_cos":
        y = np.abs(np.cos(arg + np.pi / 2))
    elif shape == "inv_rect_cos":
        y = 1 - np.abs(np.cos(arg))
    elif shape == "sqr":
        y = (np.sign(np.cos(arg + np.pi)) + 1) / 2
    elif shape == "saw":
        y = saw
    elif shape == "rsaw":
        y = 1 - saw
    elif shape == "tri":
        t = 2 * saw
        y = np.where(t > 1, 2 - t, t)
    return y**exp


@pytest.mark.parametrize("shape", LFO_SHAPES)
def test_shapes_match_reference_semantics(shape):
    y = np.asarray(make_mod_signal(1000, 441.0, 2.0, 0.5, shape, 1.0))
    ref = _ref_mod_signal(1000, 441.0, 2.0, 0.5, shape)
    np.testing.assert_allclose(y, ref, atol=2e-5)
    assert y.min() >= 0.0 and y.max() <= 1.0 + 1e-6


def test_exponent_distortion():
    y = np.asarray(make_mod_signal(500, 441.0, 1.5, 0.0, "tri", 2.0))
    ref = _ref_mod_signal(500, 441.0, 1.5, 0.0, "tri", 2.0)
    np.testing.assert_allclose(y, ref, atol=2e-5)


def test_batch_matches_single():
    freqs = np.array([0.5, 1.0, 2.0, 3.0], np.float32)
    phases = np.array([0.0, 1.0, 2.0, 3.0], np.float32)
    shapes = np.array([shape_to_idx(s) for s in ("cos", "tri", "saw", "rect_cos")])
    batch = np.asarray(make_mod_signal_batch(441, 441.0, freqs, phases, shapes))
    for i, (f, p, s) in enumerate(zip(freqs, phases, ("cos", "tri", "saw", "rect_cos"))):
        single = np.asarray(make_mod_signal(441, 441.0, float(f), float(p), s))
        np.testing.assert_allclose(batch[i], single, atol=1e-6)


def test_rand_mod_signal_anchored():
    import jax

    key = jax.random.PRNGKey(0)
    b = 8
    freq_gt = np.full((b,), 2.0, np.float32)
    phase_gt = np.full((b,), 1.0, np.float32)
    shapes_gt = np.zeros((b,), np.int32)  # all cos
    y = np.asarray(
        make_rand_mod_signal(
            key, b, 441, 441.0, 0.5, 3.0,
            shapes_gt=shapes_gt, phase_gt=phase_gt, phase_error=0.0,
            freq_gt=freq_gt, freq_error=0.0,
        )
    )
    expected = _ref_mod_signal(441, 441.0, 2.0, 1.0, "cos")
    for i in range(b):
        np.testing.assert_allclose(y[i], expected, atol=2e-5)


def test_rand_mod_signal_freq_clipped():
    import jax

    key = jax.random.PRNGKey(1)
    b = 64
    freq_gt = np.full((b,), 3.0, np.float32)
    y = np.asarray(
        make_rand_mod_signal(
            key, b, 441, 441.0, 0.5, 3.0, freq_gt=freq_gt, freq_error=0.25
        )
    )
    assert y.shape == (b, 441)
    assert np.all(y >= 0) and np.all(y <= 1 + 1e-6)
