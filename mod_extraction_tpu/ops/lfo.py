"""LFO synthesis — unipolar [0, 1] modulation signals.

TPU-native re-design of the reference's LFO generator
(`mod_extraction/modulations.py:16-101`).  Key differences:

* Fully batched: one call renders a whole (sharded) batch with per-example
  frequency / phase / shape / exponent, so LFO synthesis can live *inside*
  the jitted training step (the reference loops per example on host).
* Shapes are integer codes so the selector is a vectorized `where`-chain
  (all 7 shapes cost a handful of VPU ops on (B, T); cheaper than a
  `lax.switch` under vmap, and branch-free for SPMD).
* Phase accumulation matches the reference exactly: the argument at index
  i is 2*pi*f*(i+1)/sr + phase (cumsum over a constant, reference
  `modulations.py:31`), and rectified shapes halve freq & phase
  (`modulations.py:26-29`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mod_extraction_tpu.utils.prng import sample_uniform

# Canonical shape order. Index IS the wire format for fx_params["shape"].
LFO_SHAPES = ("cos", "rect_cos", "inv_rect_cos", "tri", "saw", "rsaw", "sqr")
_SHAPE_IDX = {name: idx for idx, name in enumerate(LFO_SHAPES)}

# Default sampling pool for random LFOs (reference `modulations.py:72`).
DEFAULT_RAND_SHAPES = ("cos", "tri", "rect_cos", "inv_rect_cos", "saw", "rsaw")


def shape_to_idx(shape) -> int:
    """Map a shape name (or pass through an int code) to its integer code."""
    if isinstance(shape, str):
        return _SHAPE_IDX[shape]
    return int(shape)


def make_mod_signal_batch(
    n_samples: int,
    sr: float,
    freq: jnp.ndarray,
    phase: jnp.ndarray,
    shape_idx: jnp.ndarray,
    exp: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Render a batch of unipolar LFOs.

    Args:
      n_samples: static output length.
      sr: sample rate of the mod signal (may be audio rate or frame rate).
      freq: (B,) Hz. Must satisfy 0 < freq < sr/2.
      phase: (B,) radians in [-2pi, 2pi].
      shape_idx: (B,) int codes into LFO_SHAPES.
      exp: scalar or (B,) exponent distortion (reference `modulations.py:55`).

    Returns:
      (B, n_samples) float32 in [0, 1].
    """
    freq = jnp.asarray(freq, jnp.float32).reshape(-1)
    phase = jnp.asarray(phase, jnp.float32).reshape(-1)
    shape_idx = jnp.asarray(shape_idx, jnp.int32).reshape(-1)
    exp = jnp.broadcast_to(jnp.asarray(exp, jnp.float32), freq.shape)

    # Rectified cosine shapes run at half frequency/phase (the rectification
    # doubles the apparent rate) — reference `modulations.py:26-29`.
    is_rect = (shape_idx == _SHAPE_IDX["rect_cos"]) | (
        shape_idx == _SHAPE_IDX["inv_rect_cos"]
    )
    freq = jnp.where(is_rect, freq / 2.0, freq)
    phase = jnp.where(is_rect, phase / 2.0, phase)

    # argument[i] = 2*pi*f*(i+1)/sr + phase (cumsum of a constant step).
    t = jnp.arange(1, n_samples + 1, dtype=jnp.float32)
    argument = (2.0 * jnp.pi / sr) * freq[:, None] * t[None, :] + phase[:, None]
    saw = jnp.mod(argument, 2.0 * jnp.pi) / (2.0 * jnp.pi)

    cos_wave = (jnp.cos(argument + jnp.pi) + 1.0) / 2.0
    rect_cos = jnp.abs(jnp.cos(argument + jnp.pi / 2.0))
    inv_rect_cos = 1.0 - jnp.abs(jnp.cos(argument))
    sqr = (jnp.sign(jnp.cos(argument + jnp.pi)) + 1.0) / 2.0
    rsaw = 1.0 - saw
    tri2 = 2.0 * saw
    tri = jnp.where(tri2 > 1.0, 2.0 - tri2, tri2)

    stacked = jnp.stack(
        [cos_wave, rect_cos, inv_rect_cos, tri, saw, rsaw, sqr], axis=0
    )
    mod_sig = jnp.take_along_axis(
        stacked, shape_idx[None, :, None], axis=0
    ).squeeze(0)

    mod_sig = jnp.where(
        exp[:, None] == 1.0, mod_sig, jnp.power(mod_sig, exp[:, None])
    )
    return mod_sig


def make_mod_signal(
    n_samples: int,
    sr: float,
    freq: float,
    phase: float = 0.0,
    shape: str = "cos",
    exp: float = 1.0,
) -> jnp.ndarray:
    """Single-example convenience wrapper (reference API parity)."""
    out = make_mod_signal_batch(
        n_samples,
        sr,
        jnp.array([freq]),
        jnp.array([phase]),
        jnp.array([shape_to_idx(shape)]),
        jnp.array([exp]),
    )
    return out[0]


def make_rand_mod_signal(
    key: jax.Array,
    batch_size: int,
    n_samples: int,
    sr: float,
    freq_min: float,
    freq_max: float,
    shapes_gt: Optional[jnp.ndarray] = None,
    shapes: Optional[Sequence[str]] = None,
    phase_gt: Optional[jnp.ndarray] = None,
    phase_error: float = 0.5,
    freq_gt: Optional[jnp.ndarray] = None,
    freq_error: float = 0.25,
) -> jnp.ndarray:
    """Batched random LFO, optionally anchored to ground-truth fx params.

    Parity target: `make_rand_mod_signal` (`modulations.py:60-101`):
    * with phase_gt: phase = (gt + U[-1,1]*pi*phase_error) mod 2pi
    * with freq_gt:  freq = clip(gt * U[1-e, 1+e], freq_min, freq_max)
    * shapes drawn from `shapes` (default reference pool) unless gt given
      (shapes_gt is an int-code array here).
    """
    if shapes is None:
        shapes = DEFAULT_RAND_SHAPES
    k_phase, k_freq, k_shape = jax.random.split(key, 3)

    if phase_gt is not None:
        phase = jnp.asarray(phase_gt, jnp.float32).reshape(-1)
        if phase_error > 0:
            err = sample_uniform(k_phase, -1.0, 1.0, (batch_size,))
            phase = phase + err * jnp.pi * phase_error
            phase = jnp.mod(phase + 2.0 * jnp.pi, 2.0 * jnp.pi)
    else:
        phase = sample_uniform(k_phase, 0.0, 2.0 * jnp.pi, (batch_size,))

    if freq_gt is not None:
        freq = jnp.asarray(freq_gt, jnp.float32).reshape(-1)
        if freq_error > 0:
            err = sample_uniform(k_freq, 1.0 - freq_error, 1.0 + freq_error, (batch_size,))
            freq = jnp.clip(freq * err, freq_min, freq_max)
    else:
        freq = sample_uniform(k_freq, freq_min, freq_max, (batch_size,))

    if shapes_gt is not None:
        shape_idx = jnp.asarray(shapes_gt, jnp.int32).reshape(-1)
    else:
        pool = jnp.array([shape_to_idx(s) for s in shapes], jnp.int32)
        draw = jax.random.randint(k_shape, (batch_size,), 0, len(shapes))
        shape_idx = pool[draw]

    return make_mod_signal_batch(n_samples, sr, freq, phase, shape_idx)
