"""On-device effect rendering, fused into the jitted training step.

This stage replaces BOTH of the reference's host-side render paths:
* `FlangerCPUDataModule.on_before_batch_transfer` — batch flanger/chorus
  rendering via a per-sample Python loop (`data_modules.py:419-458`,
  `fx.py:104-115`), and
* per-example pedalboard phaser calls in DataLoader workers
  (`datasets.py:438-441`).

The batch arrives as (dry, zeros-wet, frame-rate mod_sig, fx params) and
leaves as (dry, wet, mod_sig, fx) with everything rendered on device.
Per-example `fx["effect_idx"]` routes between effects; a batch may mix
effects (interwoven training), in which case each enabled effect kernel
runs on the full batch and rows are `where`-selected — flanger and chorus
share ONE delay-line kernel whose per-example delay ranges come from fx
params (buffer length is the static max, which is numerically identical
to the reference's per-effect buffer sizes because unwritten slots read
zero either way).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mod_extraction_tpu.data.datasets import (
    EFFECT_FLANGER_CHORUS,
    EFFECT_PHASER,
    EFFECT_TREMOLO,
    MOD_SIG_DIVISOR,
)
from mod_extraction_tpu.ops.fx import (
    apply_phaser,
    apply_tremolo,
    flanger_delay_line,
    phaser_freq_max,
)
from mod_extraction_tpu.utils.interp import linear_interpolate_last_dim


@dataclass(frozen=True)
class RenderConfig:
    """Static (hashable) render-stage configuration; goes into jit as a
    static arg."""

    sr: float
    n_samples: int
    effects: Tuple[int, ...] = ()
    max_delay_samples: int = 0  # unified flanger/chorus buffer length
    phaser_n_stages: int = 6
    audio_as_wet: bool = False  # RandomAudioChunkAndModSigDataModule mapping
    flanger_impl: str = "auto"

    @property
    def n_mod_frames(self) -> int:
        return self.n_samples // MOD_SIG_DIVISOR


def render_batch(
    batch: Dict, cfg: RenderConfig, corpus: jnp.ndarray | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict]:
    """(dry, wet, mod_sig_frames, fx) fully rendered, all on device.

    Batches from render-on-device datasets omit "wet" (it exists only as
    the kernels' output) — shipping a zeros placeholder from host would
    double the per-step host->device transfer for nothing.  Batches from
    device-corpus datasets (data/corpus.py) carry `dry_idx` offsets
    instead of audio; the chunks are gathered from `corpus` here."""
    def dequant(a):
        a = jnp.asarray(a)
        if a.dtype == jnp.int16:  # compact wire format (loader int16 mode)
            return a.astype(jnp.float32) / 32768.0
        return a

    def gather(side):
        assert corpus is not None, f"batch carries {side}_idx but no corpus set"
        chunks = jax.vmap(
            lambda i: jax.lax.dynamic_slice(corpus, (i,), (cfg.n_samples,))
        )(jnp.asarray(batch[f"{side}_idx"]))
        return dequant(chunks)[:, None, :] * batch[f"{side}_gain"][:, None, None]

    dry = gather("dry") if "dry_idx" in batch else dequant(batch["dry"])
    if "wet_idx" in batch:
        wet = gather("wet")
    elif "wet" in batch:
        wet = dequant(batch["wet"])
    else:
        wet = jnp.zeros_like(dry)
    mod_frames = jnp.asarray(batch["mod_sig"])
    fx = {k: jnp.asarray(v) for k, v in batch["fx"].items()}
    eff = fx["effect_idx"]
    b, _, t = dry.shape

    if cfg.audio_as_wet:
        # reference maps (audio, mod, params) -> (dry=None, wet=audio, ...)
        # (`data_modules.py:369-371`)
        return jnp.zeros_like(dry), dry, mod_frames, fx

    needs_mod_audio = (EFFECT_TREMOLO in cfg.effects) or (
        EFFECT_FLANGER_CHORUS in cfg.effects
    )
    if needs_mod_audio:
        # align_corners=True upsample, reference `data_modules.py:454-455`
        mod_audio = linear_interpolate_last_dim(mod_frames, t)[:, None, :]

    if EFFECT_TREMOLO in cfg.effects:
        wet_trem = apply_tremolo(dry, mod_audio[:, 0, :], fx["mix"][:, None, None])
        wet = jnp.where((eff == EFFECT_TREMOLO)[:, None, None], wet_trem, wet)

    if EFFECT_FLANGER_CHORUS in cfg.effects:
        assert cfg.max_delay_samples > 0
        mmd = jnp.round(fx["max_min_delay_ms"] / 1000.0 * cfg.sr)  # (B,)
        mld = jnp.round(fx["max_lfo_delay_ms"] / 1000.0 * cfg.sr)
        delay = (
            mld[:, None, None] * fx["width"][:, None, None] * mod_audio
            + fx["min_delay_width"][:, None, None] * mmd[:, None, None]
        )
        wet_fl = flanger_delay_line(
            dry,
            delay,
            fx["feedback"][:, None, None],
            fx["depth"][:, None, None],
            fx["mix"][:, None, None],
            cfg.max_delay_samples,
            implementation=cfg.flanger_impl,
        )
        wet = jnp.where((eff == EFFECT_FLANGER_CHORUS)[:, None, None], wet_fl, wet)

    if EFFECT_PHASER in cfg.effects:
        wet_ph, mod_ph = apply_phaser(
            dry,
            cfg.sr,
            jnp.maximum(fx["rate_hz"], 1e-3),
            fx["depth"],
            # JUCE-valid centre range (sweep bounds are 20..0.49*fs)
            jnp.clip(fx["centre_frequency_hz"], 20.0, phaser_freq_max(cfg.sr)),
            fx["feedback"],
            fx["mix"],
            phase=fx["phase"],
            n_stages=cfg.phaser_n_stages,
        )
        wet = jnp.where((eff == EFFECT_PHASER)[:, None, None], wet_ph, wet)
        # GT LFO at frame rate, mirroring the reference's audio-rate ->
        # /100 chain (`datasets.py:450`)
        mod_ph_frames = linear_interpolate_last_dim(mod_ph, cfg.n_mod_frames)
        mod_frames = jnp.where(
            (eff == EFFECT_PHASER)[:, None], mod_ph_frames, mod_frames
        )

    return dry, wet, mod_frames, fx
