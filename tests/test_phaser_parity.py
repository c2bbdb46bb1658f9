"""Numerical parity of `apply_phaser` against the independent NumPy port
of the published JUCE `dsp::Phaser` topology (tests/juce_phaser_oracle.py)
— the VERDICT round-1 gap: phaser parity was asserted, never measured.

pedalboard (the reference's phaser, `datasets.py:455-482`) wraps
juce::dsp::Phaser; the oracle re-derives that algorithm per-sample in
float64.  The scan renderer here must match it across a parameter grid
to fp32 accumulation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mod_extraction_tpu.ops.fx import apply_phaser
from mod_extraction_tpu.ops.lfo import make_mod_signal

from juce_phaser_oracle import juce_phaser

SR = 8000.0
T = 8000


def _noise(seed, c=1, t=T):
    rng = np.random.default_rng(seed)
    return (0.5 * rng.standard_normal((1, c, t))).astype(np.float32)


# (rate_hz, depth, centre_hz, feedback, mix) spanning the reference's
# fx_config ranges (configs/data/gen_idmt_ph.yml: rate 0.5-3, depth
# 0.3-1.0 / eval pins depth 1.0 centre 440 feedback 0.25 mix 1.0)
GRID = [
    (1.0, 0.5, 1300.0, 0.0, 0.5),   # pedalboard defaults
    (0.5, 1.0, 440.0, 0.25, 1.0),   # the reference eval pin (eval_lfo.yml)
    (3.0, 0.3, 600.0, 0.0, 1.0),
    (2.0, 1.0, 2000.0, 0.4, 0.7),
    (0.1, 0.8, 100.0, -0.3, 1.0),   # slow sweep, negative feedback
    (5.0, 1.0, 3000.0, 0.6, 1.0),   # fast sweep, strong feedback
]


@pytest.mark.parametrize("rate,depth,centre,feedback,mix", GRID)
def test_phaser_matches_juce_oracle(rate, depth, centre, feedback, mix):
    x = _noise(hash((rate, centre)) % 2**31)
    want = juce_phaser(x[0], SR, rate, depth, centre, feedback, mix)
    want = np.clip(want, -1.0, 1.0)
    got, _ = apply_phaser(
        jnp.asarray(x), SR, rate, depth, centre, feedback, mix,
        implementation="scan",
    )
    got = np.asarray(got)[0]
    # fp32 scan vs float64 oracle over 8k samples of IIR recursion
    err = np.max(np.abs(got - want))
    assert err < 5e-4, f"max abs err {err}"
    # and tightly correlated (guards against phase/topology drift that a
    # loose abs tolerance could hide)
    denom = np.sqrt(np.mean(want**2)) + 1e-12
    assert np.sqrt(np.mean((got - want) ** 2)) / denom < 1e-3


def test_phaser_stereo_channels_share_sweep():
    x = _noise(7, c=2)
    got, _ = apply_phaser(
        jnp.asarray(x), SR, 1.5, 0.9, 800.0, 0.3, 1.0, implementation="scan"
    )
    want = np.clip(juce_phaser(x[0], SR, 1.5, 0.9, 800.0, 0.3, 1.0), -1, 1)
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=5e-4)


def test_phaser_gt_mod_sig_is_reference_convention():
    """GT == make_mod_signal(t, sr, rate, pi/2, 'cos') (`datasets.py:442`)."""
    x = _noise(3)
    rate = 2.0
    _, mod = apply_phaser(jnp.asarray(x), SR, rate, 1.0, 440.0, 0.25, 1.0)
    ref = make_mod_signal(T, SR, rate, float(np.pi / 2), "cos")
    np.testing.assert_allclose(np.asarray(mod)[0], np.asarray(ref), atol=1e-5)


def test_phaser_sweep_antiphase_to_gt():
    """mod_sig high <=> cutoff LOW: an impulse-train probe should see the
    deepest high-frequency attenuation when the GT mod signal peaks.

    This pins the (wet, GT) phase relationship of the reference pipeline
    (JUCE osc emits -sin while the GT convention is +sin): a sign flip in
    the sweep would invert this and silently mislabel every phaser
    example."""
    sr, t = 44100.0, 44100
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal((1, 1, t))).astype(np.float32)
    rate = 1.0
    # mix=0.5: dry+allpass sum creates the notch comb (at mix=1.0 with no
    # feedback an allpass cascade is magnitude-flat and nothing is
    # observable); notch positions track the swept cutoff.
    wet, mod = apply_phaser(
        jnp.asarray(x), sr, rate, 1.0, 3000.0, 0.0, 0.5, implementation="scan"
    )
    wet, mod = np.asarray(wet)[0, 0], np.asarray(mod)[0]
    # short-time high-band energy via first difference (HF proxy)
    hp = np.abs(np.diff(wet, prepend=0.0))
    win = 2205  # 50 ms
    k = np.ones(win) / win
    hf = np.convolve(hp, k, mode="same")
    # compare HF energy where GT is at its top vs bottom decile
    top = hf[mod > 0.9].mean()
    bot = hf[mod < 0.1].mean()
    # GT high => cutoff LOW => notches sit at low frequencies => the HF
    # band survives.  GT low => cutoff high => notches carve the HF band.
    assert top > bot * 1.02, (top, bot)
