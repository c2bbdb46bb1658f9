"""Synthetic batches (no audio files needed) — for benches, smoke tests,
and the multichip dryrun.  Draws dry 'audio' as filtered noise and fx
params from the reference's training ranges
(`configs/train_lfo_phaser.yml`, `configs/data/gen_idmt_fl.yml`)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from mod_extraction_tpu.data.datasets import (
    EFFECT_FLANGER_CHORUS,
    EFFECT_PHASER,
    EFFECT_TREMOLO,
    MOD_SIG_DIVISOR,
    default_fx,
)
from mod_extraction_tpu.data.loader import collate
from mod_extraction_tpu.data.mods import LFO_SHAPES, np_make_mod_signal


def make_synthetic_batch(
    seed: int, batch_size: int, n_samples: int, sr: float, effect: str = "flanger"
) -> Dict:
    rng = np.random.default_rng(seed)
    items = []
    n_frames = n_samples // MOD_SIG_DIVISOR
    for _ in range(batch_size):
        # pink-ish noise dry signal
        white = rng.standard_normal(n_samples + 64).astype(np.float32)
        dry = np.convolve(white, np.ones(64, np.float32) / 16.0, "valid")[:n_samples]
        dry = (0.5 * dry / max(1e-6, np.abs(dry).max()))[None, :].astype(np.float32)

        rate = float(np.exp(rng.uniform(np.log(0.5), np.log(3.0))))
        phase = float(rng.uniform(0, 2 * np.pi))
        shape = int(rng.integers(0, 6))
        mod = np_make_mod_signal(
            n_frames, sr / MOD_SIG_DIVISOR, rate, phase, LFO_SHAPES[shape]
        )
        fx = default_fx()
        fx.update(rate_hz=rate, phase=phase, shape=shape, exp=1.0)
        if effect == "flanger":
            fx.update(
                effect_idx=EFFECT_FLANGER_CHORUS,
                feedback=float(rng.uniform(0.0, 0.7)),
                min_delay_width=float(rng.uniform(0.0, 1.0)),
                width=float(rng.uniform(0.25, 1.0)),
                depth=float(rng.uniform(0.25, 1.0)),
                mix=float(rng.uniform(0.25, 1.0)),
                max_min_delay_ms=1.0,
                max_lfo_delay_ms=10.0,
            )
        elif effect == "chorus":
            fx.update(
                effect_idx=EFFECT_FLANGER_CHORUS,
                feedback=float(rng.uniform(0.0, 0.7)),
                min_delay_width=float(rng.uniform(0.367, 1.0)),
                width=float(rng.uniform(0.25, 1.0)),
                depth=float(rng.uniform(0.25, 1.0)),
                mix=float(rng.uniform(0.25, 1.0)),
                max_min_delay_ms=30.0,
                max_lfo_delay_ms=10.0,
            )
        elif effect == "phaser":
            fx.update(
                effect_idx=EFFECT_PHASER,
                depth=float(rng.uniform(0.2, 1.0)),
                centre_frequency_hz=float(
                    np.exp(rng.uniform(np.log(70.0), np.log(18000.0)))
                ),
                feedback=float(rng.uniform(0.0, 0.7)),
                mix=float(rng.uniform(0.2, 1.0)),
            )
        elif effect == "tremolo":
            fx.update(effect_idx=EFFECT_TREMOLO, mix=float(rng.uniform(0.2, 1.0)))
        items.append(
            {
                "dry": dry,
                "mod_sig": mod,
                "fx": fx,
            }
        )
    return collate(items)
