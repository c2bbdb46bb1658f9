"""Independent NumPy port of the published JUCE ``dsp::Phaser`` algorithm.

pedalboard's ``Phaser`` is a thin wrapper over ``juce::dsp::Phaser``
(reference `datasets.py:9,466-471` applies it per example on host CPU).
pedalboard is not installable in this zero-egress container, so this
float64 per-sample port of the published JUCE topology serves as the
numerical oracle for `mod_extraction_tpu.ops.fx.apply_phaser`
(VERDICT round 1, "Next round" item 2).

Topology (juce_Phaser.cpp / juce_FirstOrderTPTFilter.cpp):

* 6 first-order TPT allpass stages, shared cutoff, per-channel states.
* Sine oscillator running at ``fs / 4`` (the filter cutoff is updated
  every ``maxUpdateCounter = 4`` samples; the osc is prepared on a
  4x-downsampled spec).  JUCE's ``Oscillator`` evaluates
  ``sin(phase - pi)`` with phase starting at 0, so the emitted LFO is
  ``-sin(2*pi*rate*t)``.
* Cutoff sweep: ``fc = mapToLog10(clip(normCentre + (depth/2)*lfo, 0, 1),
  20, min(20000, 0.49*fs))`` where ``normCentre = mapFromLog10(centre)``
  over the same bounds.
* Global feedback: the input to the allpass cascade is
  ``x[i] + feedback * lastOutput`` and ``lastOutput`` is the cascade
  output of the previous sample.
* Linear dry/wet mix.

The reference additionally hard-clips the result to [-1, 1]
(`datasets.py:473`); that clip is left to the caller here.
"""

from __future__ import annotations

import numpy as np

N_STAGES = 6
MAX_UPDATE_COUNTER = 4
FREQ_MIN = 20.0


def _freq_max(sr: float) -> float:
    return min(20000.0, 0.49 * sr)


def juce_phaser(
    x: np.ndarray,
    sr: float,
    rate_hz: float,
    depth: float = 0.5,
    centre_frequency_hz: float = 1300.0,
    feedback: float = 0.0,
    mix: float = 0.5,
) -> np.ndarray:
    """Process (C, T) float audio through the JUCE phaser topology."""
    x = np.asarray(x, np.float64)
    assert x.ndim == 2
    c, t = x.shape
    f_min, f_max = FREQ_MIN, _freq_max(sr)
    log_span = np.log10(f_max / f_min)
    norm_centre = np.log10(centre_frequency_hz / f_min) / log_span
    osc_volume = 0.5 * depth
    # osc runs at fs/4; phase advances by 2*pi*rate/ (fs/4) per update
    inc = 2.0 * np.pi * rate_hz * MAX_UPDATE_COUNTER / sr

    out = np.empty_like(x)
    for ch in range(c):
        s = np.zeros(N_STAGES)  # TPT state s1 per stage
        last_out = 0.0
        counter = 0
        k = 0  # osc sample index (shared cutoff sequence across channels)
        big_g = 0.0
        for i in range(t):
            if counter == 0:
                lfo = np.sin(inc * k - np.pi)  # == -sin(inc*k)
                k += 1
                pos = min(1.0, max(0.0, norm_centre + osc_volume * lfo))
                fc = f_min * (f_max / f_min) ** pos
                g = np.tan(np.pi * fc / sr)
                big_g = g / (1.0 + g)
            u = x[ch, i] + feedback * last_out
            for n in range(N_STAGES):
                v = big_g * (u - s[n])
                y = v + s[n]
                s[n] = y + v
                u = 2.0 * y - u  # first-order TPT allpass = 2*LP - in
            out[ch, i] = u
            last_out = u
            counter += 1
            if counter == MAX_UPDATE_COUNTER:
                counter = 0
    return (1.0 - mix) * x + mix * out
