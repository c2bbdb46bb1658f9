"""Corner analysis tests: numpy oracle implements the reference algorithm
semantics (mod_extraction/modulations.py:219-363) for parity checking."""

import numpy as np
import pytest

from mod_extraction_tpu.ops.corners import (
    check_mod_sig_mask,
    corners_to_mod_sig,
    find_corners,
    find_valid_mod_sig_mask,
    smoothen,
    stretch_corners,
)
from mod_extraction_tpu.ops.lfo import make_mod_signal_batch


def _np_find_corners(m):
    """Oracle: slope sign-change detection, zero-padded ends."""
    diff = m[:, 1:] - m[:, :-1]
    dr, dl = diff[:, 1:], diff[:, :-1]
    pos = np.where(dl > 0, dl, 0.0)
    neg = np.where(dl < 0, dl, 0.0)
    top = -np.floor(pos * (dr + 1e-16)).astype(np.int64)
    bot = -np.floor(neg * (dr + 1e-16)).astype(np.int64)
    z = np.zeros((m.shape[0], 1), np.int64)
    return np.concatenate([z, top, z], 1), np.concatenate([z, bot, z], 1)


def _np_stretch_one(m, top, bot, top_val=1.0, bot_val=0.0):
    """Oracle for per-example corner stretching: walk anchors in order,
    rescale each (prev, cur] segment so cur hits its target."""
    anchors = [(i, top_val) for i in np.where(top == 1)[0]]
    anchors += [(i, bot_val) for i in np.where(bot == 1)[0]]
    anchors += [(len(m) - 1, m[-1])]
    anchors.sort(key=lambda a: a[0])
    out = m.copy()
    prev_i, prev_t = 0, m[0]
    for cur_i, cur_t in anchors:
        seg = out[prev_i + 1 : cur_i + 1].copy()
        if prev_t != cur_t and len(seg) > 0:
            rng = abs(m[prev_i] - m[cur_i])
            scale = abs(prev_t - cur_t) / rng
            seg = (seg - seg.min()) * scale
            seg += cur_t - seg[-1]
            out[prev_i + 1 : cur_i + 1] = seg
        prev_i, prev_t = cur_i, cur_t
    return out


def _lfo_batch(shapes, freq=2.0, phase=0.3, n=345, sr=172.5):
    import numpy as np

    b = len(shapes)
    from mod_extraction_tpu.ops.lfo import shape_to_idx

    return np.asarray(
        make_mod_signal_batch(
            n,
            sr,
            np.full((b,), freq, np.float32),
            np.full((b,), phase, np.float32),
            np.array([shape_to_idx(s) for s in shapes]),
        )
    )


def test_find_corners_matches_oracle():
    m = _lfo_batch(["cos", "tri", "saw", "rsaw", "rect_cos", "sqr"])
    top, bot = find_corners(m)
    top_np, bot_np = _np_find_corners(np.asarray(m, np.float64))
    np.testing.assert_array_equal(np.asarray(top), top_np)
    np.testing.assert_array_equal(np.asarray(bot), bot_np)


def test_smoothen():
    x = np.arange(20, dtype=np.float32)[None, :]
    y = np.asarray(smoothen(x, 4))
    assert y.shape == (1, 17)
    expect = np.stack([x[0, i : i + 4].mean() for i in range(17)])
    np.testing.assert_allclose(y[0], expect, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(smoothen(x, 1)), x)


@pytest.mark.parametrize("shape", ["cos", "tri", "saw"])
def test_stretch_corners_matches_oracle(shape):
    # scale/offset a clean LFO so corners aren't at 0/1 anymore
    m = 0.25 + 0.5 * _lfo_batch([shape] * 2, freq=1.7, phase=1.1)
    m = m.astype(np.float32)
    out = np.asarray(stretch_corners(m, max_n_corners=10, smooth_n_frames=0))
    top, bot = _np_find_corners(np.asarray(m, np.float64))
    for i in range(m.shape[0]):
        expect = _np_stretch_one(m[i].astype(np.float64), top[i], bot[i])
        np.testing.assert_allclose(out[i], expect, atol=1e-4)


def test_stretch_corners_skips_busy_signals():
    m = _lfo_batch(["cos"], freq=20.0, n=345, sr=172.5 * 10)
    out = np.asarray(stretch_corners(m, max_n_corners=3, smooth_n_frames=0))
    np.testing.assert_allclose(out, m, atol=1e-6)


def test_stretch_with_smoothing_shrinks():
    m = _lfo_batch(["cos"] * 3)
    out = stretch_corners(m, max_n_corners=10, smooth_n_frames=8)
    assert out.shape == (3, 345 - 8 + 1)


def test_check_mod_sig_mask():
    good = _lfo_batch(["cos"], freq=1.5)  # ~3 periods in 2s -> valid
    too_fast = _lfo_batch(["cos"], freq=30.0)  # too many corners
    flat = np.full((1, 345), 0.5, np.float32)  # no corners
    m = np.concatenate([good, too_fast, flat], 0)
    mask = np.asarray(find_valid_mod_sig_mask(m))
    assert mask.tolist() == [True, False, False]


def test_check_mod_sig_spacing_rule():
    # two tops closer than 10% of the frames -> invalid
    t = 345
    m = np.full((t,), 0.1, np.float32)
    for c in (100, 110):  # 10 frames apart < 34
        m[c] = 0.9
    m[105] = 0.05  # bottom between them
    m[200] = 0.02
    mask = np.asarray(find_valid_mod_sig_mask(m[None, :]))
    assert not mask[0]


def test_corners_to_mod_sig():
    t = 100
    top = np.zeros(t, np.int64)
    bot = np.zeros(t, np.int64)
    top[20] = 1
    bot[60] = 1
    out = np.asarray(corners_to_mod_sig(top, bot))
    assert out[20] == pytest.approx(1.0)
    assert out[60] == pytest.approx(0.0)
    assert out[40] == pytest.approx(0.5)
    np.testing.assert_allclose(out[:20], 0.0)
    np.testing.assert_allclose(out[61:], 0.0)
    # empty masks -> zeros
    np.testing.assert_allclose(
        np.asarray(corners_to_mod_sig(np.zeros(t, np.int64), bot)), 0.0
    )


def test_stretch_corners_fuzz_noisy_signals(rng):
    """Fuzz the jittable fixed-budget stretch against the per-example
    oracle on NOISY, quasi-LFO-like signals (what the TBPTT task actually
    feeds it: smoothed extractor outputs, reference lightning.py:284-300),
    including the max_n_corners skip rule."""
    n, b = 256, 24
    base = _lfo_batch(
        ["cos", "tri", "saw", "rsaw", "rect_cos", "inv_rect_cos"] * 4,
        freq=1.7, phase=0.9, n=n, sr=128.0,
    )
    noisy = np.clip(
        base + 0.04 * rng.standard_normal(base.shape).astype(np.float32), 0, 1
    )
    smooth_n = 8
    sm = np.asarray(smoothen(noisy, smooth_n))
    max_n_corners = 16

    ours = np.asarray(
        stretch_corners(noisy, max_n_corners=max_n_corners,
                        smooth_n_frames=smooth_n)
    )
    top, bot = (np.asarray(a) for a in find_corners(sm))
    n_degenerate = 0
    for i in range(b):
        if top[i].sum() + bot[i].sum() > max_n_corners:
            expect = sm[i]
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                expect = _np_stretch_one(sm[i].astype(np.float64), top[i], bot[i])
        if not np.isfinite(expect).all():
            # the REFERENCE divides by zero on plateau segments (equal
            # original anchor values, modulations.py:281-283 has no
            # guard); our device op must stay finite there instead
            n_degenerate += 1
            assert np.isfinite(ours[i]).all(), f"example {i} not finite"
            continue
        np.testing.assert_allclose(ours[i], expect, atol=2e-4,
                                   err_msg=f"example {i}")
    assert n_degenerate < b // 2  # most examples exercise real parity
