"""LFO-driven audio effects, rendered on device inside the training step.

TPU-native re-design of the reference's effect renderers:

* `apply_tremolo`  — parity with `mod_extraction/fx.py:13-22`.
* `apply_flanger_chorus` — parity with `MonoFlangerChorusModule.apply_effect`
  (`fx.py:72-119`), whose per-sample Python loop (`fx.py:104-115`) is the
  reference's single hottest code path (it renders whole batches on host
  CPU per training batch, `data_modules.py:419-458`).  Here the feedback
  recurrence runs as a `lax.scan` over time with the circular delay line as
  the carry — batched over examples/channels, jittable, shardable.  A
  fused Pallas kernel lives in `ops/pallas_fx.py` (selected via
  `implementation=`).
* `apply_phaser` — replaces the host-side pedalboard (JUCE C++) `Phaser`
  (`datasets.py:455-482`).  Topology: cascade of 6 first-order TPT
  (topology-preserving transform) allpass filters whose shared cutoff is
  swept log-spaced between 20 Hz and min(20 kHz, 0.49*fs) by a sine LFO
  centered at `centre_frequency_hz` (updated every 4 samples), with
  global feedback and a linear dry/wet mix — the published structure of
  `juce::dsp::Phaser`, which pedalboard wraps.  Numerically pinned to
  the independent oracle port in `tests/juce_phaser_oracle.py`
  (`tests/test_phaser_parity.py`).  The ground-truth mod signal follows
  `datasets.py:442` (`make_mod_signal(..., pi/2, "cos")`).

All renderers are data generators (the reference runs them under
`no_grad`, `fx.py:129`), so none of them need custom VJPs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _param_bc(p, batch_size: int, ndim: int) -> jnp.ndarray:
    """Broadcast a scalar or (B,) param to (B, 1) or (B, 1, 1)."""
    p = jnp.asarray(p, jnp.float32)
    if p.ndim == 0:
        p = jnp.full((batch_size,), p)
    return p.reshape((batch_size,) + (1,) * (ndim - 1))


def apply_tremolo(x: jnp.ndarray, mod_sig: jnp.ndarray, mix=1.0) -> jnp.ndarray:
    """Amplitude modulation: (1-mix)*x + mix*mod*x (reference `fx.py:13-22`).

    x: (B, C, T); mod_sig: (B, T) or (B, C, T); mix: scalar or (B,).
    """
    assert x.ndim == 3
    if mod_sig.ndim == 2:
        mod_sig = mod_sig[:, None, :]
    mix = _param_bc(mix, x.shape[0], 3)
    return (1.0 - mix) * x + mix * mod_sig * x


def ms_to_samples(ms: float, sr: float) -> int:
    """Round-half-up ms -> samples (reference `fx.py:40-41`)."""
    return int((ms / 1000.0) * sr + 0.5)


def flanger_delay_line(
    x: jnp.ndarray,
    delay_samples: jnp.ndarray,
    feedback: jnp.ndarray,
    depth: jnp.ndarray,
    mix: jnp.ndarray,
    max_delay_samples: int,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Core fractional-delay-line renderer with feedback.

    x: (B, C, T); delay_samples: (B, C, T) float delays (must be <
    max_delay_samples); feedback/depth/mix: (B, 1, 1).  Semantics match
    the reference loop (`fx.py:95-118`) including the final hard clip.
    The delay-line length is static; using a longer line than an effect
    needs is exact (out-of-window slots read as the same zeros).
    """
    if implementation in ("pallas", "auto") and _pallas_available():
        try:
            from mod_extraction_tpu.ops.pallas_fx import flanger_pallas

            return flanger_pallas(
                x, delay_samples, feedback, depth, mix, max_delay_samples
            )
        except (ImportError, NotImplementedError):
            if implementation == "pallas":
                raise
    return _flanger_scan(x, delay_samples, feedback, depth, mix, max_delay_samples)


@partial(jax.jit, static_argnames=("max_delay_samples",))
def _flanger_scan(x, delay_samples, feedback, depth, mix, max_delay_samples: int):
    b, c, t = x.shape
    d = max_delay_samples

    write_idx = jnp.arange(t, dtype=jnp.int32) % d
    read_idx = jnp.mod(
        write_idx[None, None, :].astype(jnp.float32) - delay_samples + d, d
    )
    frac = read_idx - jnp.floor(read_idx)
    prev_idx = jnp.floor(read_idx).astype(jnp.int32)
    next_idx = jnp.mod(prev_idx + 1, d)

    def step(buf, inputs):
        x_t, p_t, n_t, f_t, w_t = inputs
        prev_val = jnp.take_along_axis(buf, p_t[:, :, None], axis=2)[..., 0]
        next_val = jnp.take_along_axis(buf, n_t[:, :, None], axis=2)[..., 0]
        interp = f_t * next_val + (1.0 - f_t) * prev_val
        written = x_t + feedback[..., 0] * interp  # feedback is (B,1,1)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, written[:, :, None], w_t, axis=2
        )
        out_t = x_t + depth[..., 0] * interp
        return buf, out_t

    buf0 = jnp.zeros((b, c, d), jnp.float32)
    xs = (
        jnp.moveaxis(x, 2, 0),
        jnp.moveaxis(prev_idx, 2, 0),
        jnp.moveaxis(next_idx, 2, 0),
        jnp.moveaxis(frac, 2, 0),
        write_idx,
    )
    _, out = jax.lax.scan(step, buf0, xs)
    out = jnp.moveaxis(out, 0, 2)
    out = (1.0 - mix) * x + mix * out
    return jnp.clip(out, -1.0, 1.0)


def apply_flanger_chorus(
    x: jnp.ndarray,
    mod_sig: jnp.ndarray,
    sr: float,
    max_min_delay_ms: float,
    max_lfo_delay_ms: float,
    feedback=0.0,
    min_delay_width=1.0,
    width=1.0,
    depth=1.0,
    mix=1.0,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Batched mono flanger/chorus with feedback (parity: `fx.py:72-119`).

    Fractional-delay line of `max_min + max_lfo` ms; per-sample delay =
    max_lfo_delay * width * mod_sig + min_delay_width * max_min_delay;
    linear-interpolated read, feedback write, depth mix, then dry/wet mix
    and hard clip.  Flanger configs use max_min_delay_ms=1.0, chorus
    30.0 with min_delay_width >= 0.367 (`configs/data/gen_idmt_*.yml`).

    Args:
      x: (B, C, T) dry audio. mod_sig: (B, T) or (B, C, T) in [0, 1]
        (audio rate). Scalar or (B,) params.
      implementation: "auto" | "scan" | "pallas".
    """
    assert x.ndim == 3
    b = x.shape[0]
    if mod_sig.ndim == 2:
        mod_sig = mod_sig[:, None, :]
    mod_sig = jnp.broadcast_to(mod_sig, x.shape)
    feedback = _param_bc(feedback, b, 3)
    min_delay_width = _param_bc(min_delay_width, b, 3)
    width = _param_bc(width, b, 3)
    depth = _param_bc(depth, b, 3)
    mix = _param_bc(mix, b, 3)
    mmd = ms_to_samples(max_min_delay_ms, sr)
    mld = ms_to_samples(max_lfo_delay_ms, sr)
    delay_samples = mld * width * mod_sig + min_delay_width * mmd
    return flanger_delay_line(
        x, delay_samples, feedback, depth, mix, mmd + mld, implementation
    )


def _pallas_available() -> bool:
    return jax.default_backend() == "tpu"


#: JUCE `dsp::Phaser` cutoff-sweep bounds: 20 Hz .. min(20 kHz, 0.49*fs)
PHASER_FREQ_MIN = 20.0
#: JUCE `dsp::Phaser` updates the filter cutoff every 4 samples; its LFO
#: oscillator runs on a 4x-downsampled spec.
PHASER_UPDATE_EVERY = 4


def phaser_freq_max(sr: float) -> float:
    return min(20000.0, 0.49 * sr)


def map_from_log10(f, f_min: float = PHASER_FREQ_MIN, f_max: float = 20000.0):
    """Normalized log-position of frequency f in [f_min, f_max] (JUCE
    `mapFromLog10`)."""
    return jnp.log10(jnp.asarray(f, jnp.float32) / f_min) / jnp.log10(f_max / f_min)


def map_to_log10(x, f_min: float = PHASER_FREQ_MIN, f_max: float = 20000.0):
    """Inverse of `map_from_log10`."""
    return f_min * jnp.power(f_max / f_min, x)


@partial(jax.jit, static_argnames=("n_stages",))
def _phaser_scan(x, g_all, feedback, mix, n_stages: int):
    b, c, t = x.shape

    def step(carry, inputs):
        states, last_out = carry  # (B, C, n_stages), (B, C)
        x_t, g_t = inputs  # (B, C), (B, C)
        big_g = g_t / (1.0 + g_t)
        u = x_t + feedback[..., 0] * last_out
        new_states = []
        for n in range(n_stages):
            s = states[:, :, n]
            v = big_g * (u - s)
            lp = v + s
            new_states.append(lp + v)
            u = 2.0 * lp - u  # first-order allpass = 2*LP - x
        states = jnp.stack(new_states, axis=2)
        return (states, u), u

    carry0 = (jnp.zeros((b, c, n_stages), jnp.float32), jnp.zeros((b, c), jnp.float32))
    xs = (jnp.moveaxis(x, 2, 0), jnp.moveaxis(g_all, 2, 0))
    _, out = jax.lax.scan(step, carry0, xs)
    out = jnp.moveaxis(out, 0, 2)
    return (1.0 - mix) * x + mix * out


def apply_phaser(
    x: jnp.ndarray,
    sr: float,
    rate_hz,
    depth=0.5,
    centre_frequency_hz=1300.0,
    feedback=0.0,
    mix=0.5,
    phase=0.0,
    n_stages: int = 6,
    mod_sig: jnp.ndarray | None = None,
    implementation: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Time-varying allpass-cascade phaser (pedalboard/JUCE-style).

    Replaces `apply_pedalboard_phaser` (`datasets.py:455-482`) with an
    on-device renderer matching the JUCE topology numerically
    (tests/test_phaser_parity.py vs tests/juce_phaser_oracle.py).
    `phase` (radians) shifts both the sweep and the GT mod signal
    coherently — the uniform-random-phase equivalent of the reference's
    render-longer-then-random-crop.  The returned GT mod signal follows
    the reference convention (`make_mod_signal(..., pi/2, "cos")`,
    `datasets.py:442`), which is ANTIPHASE to the JUCE sweep LFO.

    Returns: (wet (B, C, T) clipped to [-1, 1], mod_sig (B, T) in [0, 1]).
    """
    assert x.ndim == 3
    b, c, t = x.shape
    rate_hz = jnp.asarray(rate_hz, jnp.float32).reshape(-1)
    phase = jnp.broadcast_to(jnp.asarray(phase, jnp.float32), (b,))
    depth_b = _param_bc(depth, b, 3)
    feedback_b = _param_bc(feedback, b, 3)
    mix_b = _param_bc(mix, b, 3)
    centre = jnp.asarray(centre_frequency_hz, jnp.float32).reshape(-1)
    f_max = phaser_freq_max(sr)

    # GT mod signal: reference `make_mod_signal(n, sr, rate, pi/2, "cos")`
    # (`datasets.py:442`) == (sin(2*pi*f*(i+1)/sr + phase) + 1) / 2 with
    # the cumsum-from-1 convention.  `phase` here is our uniform-phase
    # shortcut for the reference's render-longer-then-random-crop.
    i = jnp.arange(1, t + 1, dtype=jnp.float32)
    arg = (2.0 * jnp.pi / sr) * rate_hz[:, None] * i[None, :] + phase[:, None]
    mod_sig = (jnp.sin(arg) + 1.0) / 2.0

    # Cutoff sweep, exact JUCE `dsp::Phaser` semantics (oracle:
    # tests/juce_phaser_oracle.py): the osc runs at sr/4 and emits
    # -sin(2*pi*f*t) (JUCE Oscillator evaluates sin(phase - pi)); the
    # cutoff is held for 4 samples per update.  Note the sweep LFO is
    # ANTIPHASE to the GT mod signal — mod_sig high <=> cutoff low —
    # matching the reference pipeline's (wet, GT) relationship.
    upd = PHASER_UPDATE_EVERY
    n_upd = -(-t // upd)
    k4 = jnp.arange(n_upd, dtype=jnp.float32) * float(upd)
    arg_u = (2.0 * jnp.pi / sr) * rate_hz[:, None] * k4[None, :] + phase[:, None]
    lfo_u = -jnp.sin(arg_u)  # (B, n_upd)
    norm_centre = map_from_log10(centre, f_max=f_max)[:, None]  # (B, 1)
    swing = 0.5 * depth_b[:, :, 0]  # oscVolume = depth / 2
    pos01 = jnp.clip(norm_centre + swing * lfo_u, 0.0, 1.0)
    fc = map_to_log10(pos01, f_max=f_max)
    g_u = jnp.tan(jnp.pi * fc / sr)  # (B, n_upd), TPT prewarp
    g = jnp.repeat(g_u, upd, axis=1)[:, :t]
    g_all = jnp.broadcast_to(g[:, None, :], (b, c, t))

    if implementation in ("pallas", "auto") and _pallas_available():
        try:
            from mod_extraction_tpu.ops.pallas_fx import phaser_pallas

            wet = phaser_pallas(x, g_all, feedback_b, mix_b, n_stages=n_stages)
            return jnp.clip(wet, -1.0, 1.0), mod_sig
        except (ImportError, NotImplementedError):
            if implementation == "pallas":
                raise
    wet = _phaser_scan(x, g_all, feedback_b, mix_b, n_stages)
    return jnp.clip(wet, -1.0, 1.0), mod_sig
