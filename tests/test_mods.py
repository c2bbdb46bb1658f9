"""Host-side mod-signal generator tests (data/mods.py).

These cover the quasiperiodic / concave-convex / combined LFO variants
(reference `mod_extraction/modulations.py:104-210`) that run in the input
pipeline, plus the host/device LFO-parity bridge that makes host- and
device-generated signals interchangeable.
"""

import numpy as np
import pytest

from mod_extraction_tpu.data.mods import (
    make_combined_mod_sig,
    make_concave_convex_mod_sig,
    make_quasi_periodic,
    np_find_corners,
    np_linear_interp,
    np_make_mod_signal,
)
from mod_extraction_tpu.ops.lfo import LFO_SHAPES


@pytest.mark.parametrize("shape", sorted(LFO_SHAPES))
def test_host_lfo_matches_device_lfo(shape):
    """np_make_mod_signal mirrors ops/lfo.py exactly (the docstring's
    contract: host and device LFOs are interchangeable)."""
    import jax.numpy as jnp

    from mod_extraction_tpu.ops.lfo import make_mod_signal

    n, sr, freq, phase = 345, 172.5, 1.3, 2.1
    host = np_make_mod_signal(n, sr, freq, phase, shape, exp=1.0)
    dev = np.asarray(
        make_mod_signal(n, sr, jnp.float32(freq), jnp.float32(phase), shape)
    )
    np.testing.assert_allclose(host, dev, atol=2e-5)


def test_quasi_periodic_properties(rng):
    m = np_make_mod_signal(500, 100.0, 2.0, 0.3, "tri")
    out = make_quasi_periodic(rng, m)
    assert out.shape == m.shape
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, m)  # sections were actually re-stretched

    # deterministic under a fixed seed
    a = make_quasi_periodic(np.random.default_rng(7), m)
    b = make_quasi_periodic(np.random.default_rng(7), m)
    np.testing.assert_array_equal(a, b)


def test_quasi_periodic_needs_two_corners(rng):
    flat = np.linspace(0.4, 0.6, 100, dtype=np.float32)  # no corners
    out = make_quasi_periodic(rng, flat)
    np.testing.assert_array_equal(out, flat)


def test_quasi_periodic_preserves_period_structure(rng):
    """Stretch factors are bounded (l/r = 0.2), so the corner COUNT can
    drift by at most ~20% (sections shrink/grow by <=20% and the result
    is cropped back to the original length)."""
    m = np_make_mod_signal(600, 100.0, 1.5, 0.0, "tri")
    out = make_quasi_periodic(rng, m)
    top0, bot0 = np_find_corners(m)
    top1, bot1 = np_find_corners(out)
    n0 = int(top0.sum() + bot0.sum())
    n1 = int(top1.sum() + bot1.sum())
    assert abs(n0 - n1) <= max(2, int(0.25 * n0) + 1)


def test_concave_convex_properties(rng):
    n = 500
    out = make_concave_convex_mod_sig(rng, n, 100.0, 2.0, 0.5)
    tri = np_make_mod_signal(n, 100.0, 2.0, 0.5, "tri")
    assert out.shape == (n,)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # exponent distortion fixes 0 and 1: corners of the base triangle
    # survive exactly
    peaks = np.abs(tri - 1.0) < 1e-6
    zeros = tri < 1e-6
    np.testing.assert_allclose(out[peaks], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[zeros], 0.0, atol=1e-6)
    # each section is tri**e for a single e in [0.2, 3]; spot-check via
    # log-ratio constancy inside one section
    top, bottom = np_find_corners(tri)
    idxs = np.nonzero((top + bottom) == 1)[0]
    a, b = int(idxs[0]) + 1, int(idxs[1])  # strict interior of a section
    seg_tri, seg_out = tri[a:b], out[a:b]
    mask = (seg_tri > 1e-3) & (seg_tri < 1 - 1e-3) & (seg_out > 1e-6)
    e = np.log(seg_out[mask]) / np.log(seg_tri[mask])
    assert e.std() < 1e-3
    assert 0.2 - 1e-6 <= e.mean() <= 3.0 + 1e-6


def test_combined_mod_sig_properties(rng):
    shapes = ["cos", "tri", "saw", "rsaw"]
    out = make_combined_mod_sig(rng, 600, 100.0, 1.5, 0.0, shapes)
    assert out.shape == (600,)
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6
    # deterministic under a fixed seed, and the shape choices vary
    a = make_combined_mod_sig(np.random.default_rng(3), 600, 100.0, 1.5, 0.0, shapes)
    b = make_combined_mod_sig(np.random.default_rng(3), 600, 100.0, 1.5, 0.0, shapes)
    np.testing.assert_array_equal(a, b)
    c = make_combined_mod_sig(np.random.default_rng(4), 600, 100.0, 1.5, 0.0, shapes)
    assert not np.allclose(a, c)


def test_np_linear_interp_matches_align_corners():
    x = np.array([0.0, 1.0, 4.0, 9.0], np.float32)
    out = np_linear_interp(x, 7)
    # endpoints pinned (align_corners=True)
    assert out[0] == x[0] and out[-1] == x[-1]
    expected = np.interp(np.arange(7) * 3 / 6, np.arange(4), x)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_sample_exp_scalar_and_ranged():
    """sample_exp: scalar passes through; {min,max,p_identity} mixes
    p_identity mass at exactly 1.0 with uniform draws over [min, max]."""
    import numpy as np

    from mod_extraction_tpu.data.datasets import sample_exp

    rng = np.random.default_rng(0)
    assert sample_exp(rng, 2.0) == 2.0
    draws = np.array([
        sample_exp(rng, {"min": 0.4, "max": 2.5, "p_identity": 0.5})
        for _ in range(2000)
    ])
    assert ((draws >= 0.4) & (draws <= 2.5)).all()
    identity_frac = np.mean(draws == 1.0)
    assert 0.42 < identity_frac < 0.58
    non_id = draws[draws != 1.0]
    assert non_id.min() < 0.6 and non_id.max() > 2.3
