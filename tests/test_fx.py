"""Effect renderer tests: flanger vs per-sample numpy oracle, phaser
properties (allpass behavior, notch sweeping), tremolo parity."""

import numpy as np
import pytest

from mod_extraction_tpu.ops.fx import (
    apply_flanger_chorus,
    apply_phaser,
    apply_tremolo,
    ms_to_samples,
)
from mod_extraction_tpu.ops.lfo import make_mod_signal


def _np_flanger(x, mod, fb, mdw, width, depth, mix, mmd, mld):
    """Oracle: per-sample fractional delay line with feedback, following
    the reference semantics (mod_extraction/fx.py:92-118)."""
    b, c, t = x.shape
    d = mmd + mld
    buf = np.zeros((b, c, d))
    out = np.zeros_like(x)
    delay = mld * width[:, None, None] * mod + mdw[:, None, None] * mmd
    for i in range(t):
        w = i % d
        r = (w - delay[:, :, i] + d) % d
        p = np.floor(r).astype(int)
        n = (p + 1) % d
        frac = r - p
        pv = np.take_along_axis(buf, p[:, :, None], 2)[..., 0]
        nv = np.take_along_axis(buf, n[:, :, None], 2)[..., 0]
        interp = frac * nv + (1 - frac) * pv
        buf[:, :, w] = x[:, :, i] + fb[:, None] * interp
        out[:, :, i] = x[:, :, i] + depth[:, None] * interp
    out = (1 - mix[:, None, None]) * x + mix[:, None, None] * out
    return np.clip(out, -1, 1)


def test_flanger_matches_oracle(rng):
    b, c, t = 3, 1, 2000
    sr = 8000.0
    x = (0.5 * rng.standard_normal((b, c, t))).astype(np.float32)
    mod = np.asarray(
        make_mod_signal(t, sr, 2.0, 0.0, "tri")
    )[None, None, :].repeat(b, 0)
    fb = np.array([0.0, 0.3, 0.6], np.float32)
    mdw = np.array([0.0, 0.5, 1.0], np.float32)
    width = np.array([0.25, 0.6, 1.0], np.float32)
    depth = np.array([1.0, 0.5, 0.8], np.float32)
    mix = np.array([1.0, 0.7, 0.9], np.float32)
    ours = np.asarray(
        apply_flanger_chorus(
            x, mod[:, 0], sr, 1.0, 10.0, fb, mdw, width, depth, mix,
            implementation="scan",
        )
    )
    mmd, mld = ms_to_samples(1.0, sr), ms_to_samples(10.0, sr)
    ref = _np_flanger(
        x.astype(np.float64), mod.astype(np.float64), fb, mdw, width, depth,
        mix, mmd, mld,
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_tremolo():
    x = np.ones((2, 1, 10), np.float32)
    mod = np.linspace(0, 1, 10, dtype=np.float32)[None].repeat(2, 0)
    out = np.asarray(apply_tremolo(x, mod, 1.0))
    np.testing.assert_allclose(out[0, 0], mod[0], atol=1e-6)
    half = np.asarray(apply_tremolo(x, mod, 0.5))
    np.testing.assert_allclose(half[0, 0], 0.5 + 0.5 * mod[0], atol=1e-6)


def test_phaser_silence_and_shape(rng):
    sr = 44100.0
    x = np.zeros((2, 1, 4096), np.float32)
    wet, mod = apply_phaser(x, sr, rate_hz=np.array([1.0, 2.0]), phase=0.0)
    assert wet.shape == x.shape
    assert mod.shape == (2, 4096)
    np.testing.assert_allclose(np.asarray(wet), 0.0, atol=1e-7)
    m = np.asarray(mod)
    assert m.min() >= 0 and m.max() <= 1


def test_phaser_allpass_preserves_energy_static():
    """With depth=0 (static cutoff), fb=0, mix=1 the cascade is allpass:
    a long noise segment keeps its energy (steady-state)."""
    rng = np.random.default_rng(1)
    sr = 44100.0
    t = 16384
    x = (0.1 * rng.standard_normal((1, 1, t))).astype(np.float32)
    wet, _ = apply_phaser(
        x, sr, rate_hz=1.0, depth=0.0, centre_frequency_hz=1000.0,
        feedback=0.0, mix=1.0,
    )
    e_in = float((x[..., 2048:] ** 2).sum())
    e_out = float((np.asarray(wet)[..., 2048:] ** 2).sum())
    assert abs(e_out - e_in) / e_in < 0.05


def test_phaser_creates_notches():
    """mix=0.5 with a static allpass chain creates spectral notches: the
    output spectrum of white noise must dip well below the input's."""
    rng = np.random.default_rng(2)
    sr = 44100.0
    t = 32768
    x = (0.1 * rng.standard_normal((1, 1, t))).astype(np.float32)
    wet, _ = apply_phaser(
        x, sr, rate_hz=0.01, depth=0.0, centre_frequency_hz=1000.0,
        feedback=0.0, mix=0.5, phase=0.0,
    )
    xf = np.abs(np.fft.rfft(x[0, 0]))
    yf = np.abs(np.fft.rfft(np.asarray(wet)[0, 0]))
    # smooth magnitude ratios in octave bands; expect a deep minimum
    ratio = yf[10:] / np.maximum(xf[10:], 1e-9)
    k = 64
    sm = np.convolve(ratio, np.ones(k) / k, mode="valid")
    assert sm.min() < 0.35
    assert sm.max() > 0.8


def test_phaser_mod_sig_matches_reference_convention():
    """GT mod sig = make_mod_signal(..., phase + pi/2, 'cos') (sin LFO)."""
    sr = 441.0
    t = 441
    x = np.zeros((1, 1, t), np.float32)
    _, mod = apply_phaser(x, sr, rate_hz=2.0, phase=0.0)
    expect = np.asarray(make_mod_signal(t, sr, 2.0, np.pi / 2, "cos"))
    np.testing.assert_allclose(np.asarray(mod)[0], expect, atol=1e-4)
