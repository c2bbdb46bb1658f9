"""Pallas TPU kernels for the sample-rate recurrent effects.

These are the framework's hot DSP loops (SURVEY.md §7.4 item 1): the
flanger/chorus fractional-delay line with feedback (reference semantics
`mod_extraction/fx.py:95-118`) and the allpass-cascade phaser (replacing
the host-side pedalboard phaser, `mod_extraction/datasets.py:455-482`).
Both are strict per-sample recurrences, so the kernels keep all state
(delay line / allpass states) in VMEM scratch and walk time inside the
kernel with `fori_loop`, amortizing loop overhead that a `lax.scan`
re-pays at the XLA level each step.

Layout: the batch*channel axis is flattened and padded to 128 lanes; the
grid is (lane-tiles, time-chunks) with time innermost, so the VMEM state
persists across time chunks of the same lane tile (TPU grids iterate
sequentially) and is reset at chunk 0.  Audio streams through VMEM in
(T_chunk, 128) blocks.

The per-lane fractional gather from the delay line is expressed as a
masked sum over the (d, 128) delay buffer: TPUs have no per-lane gather,
but the VPU chews through `(rows == idx) * buf` at full width — this is
the idiomatic one-hot-read trick.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Flanger / chorus delay line
# ---------------------------------------------------------------------------


def _flanger_kernel(
    x_ref,  # (T_chunk, LANES) VMEM
    delay_ref,  # (T_chunk, LANES) VMEM
    fb_ref,  # (1, LANES) VMEM
    depth_ref,  # (1, LANES) VMEM
    out_ref,  # (T_chunk, LANES) VMEM
    buf_ref,  # (d_pad, LANES) VMEM scratch — circular delay line
    *,
    t_chunk: int,
    d: int,
    d_pad: int,
):
    tc = pl.program_id(1)

    @pl.when(tc == 0)
    def _():
        buf_ref[:] = jnp.zeros_like(buf_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (d_pad, LANES), 0)
    fb = fb_ref[0, :]
    depth = depth_ref[0, :]
    t0 = tc * t_chunk

    def step(i, _):
        x_t = x_ref[i, :]
        # circular write index (shared by all lanes)
        w = jax.lax.rem(t0 + i, d)
        # per-lane fractional read position
        read_pos = jnp.mod(w.astype(jnp.float32) - delay_ref[i, :] + d, d)
        prev_idx = jnp.floor(read_pos)
        frac = read_pos - prev_idx
        prev_i = prev_idx.astype(jnp.int32)
        next_i = jax.lax.rem(prev_i + 1, d)
        # one-hot weighted read: interp = (1-frac)*buf[prev] + frac*buf[next]
        wgt = jnp.where(rows == prev_i[None, :], (1.0 - frac)[None, :], 0.0)
        wgt = wgt + jnp.where(rows == next_i[None, :], frac[None, :], 0.0)
        interp = jnp.sum(wgt * buf_ref[:], axis=0)
        buf_ref[pl.ds(w, 1), :] = (x_t + fb * interp)[None, :]
        out_ref[i, :] = x_t + depth * interp
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0)


@functools.partial(
    jax.jit, static_argnames=("max_delay_samples", "t_chunk", "interpret")
)
def flanger_pallas(
    x: jnp.ndarray,
    delay_samples: jnp.ndarray,
    feedback: jnp.ndarray,
    depth: jnp.ndarray,
    mix: jnp.ndarray,
    max_delay_samples: int,
    t_chunk: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas implementation of `ops.fx.flanger_delay_line`.

    Same contract as the `lax.scan` reference implementation: x /
    delay_samples (B, C, T); feedback/depth/mix (B, 1, 1); returns the
    dry/wet mixed, hard-clipped (B, C, T).
    """
    b, c, t = x.shape
    d = int(max_delay_samples)
    assert d >= 2, "delay line must hold at least 2 samples"
    d_pad = _round_up(d, 8)
    n = b * c
    n_pad = _round_up(n, LANES)
    t_pad = _round_up(t, t_chunk)

    def to_tn(a):  # (B, C, T) -> (T_pad, N_pad)
        a = a.reshape(n, t).T
        return jnp.pad(a, ((0, t_pad - t), (0, n_pad - n)))

    x_tn = to_tn(x)
    delay_tn = to_tn(jnp.broadcast_to(delay_samples, x.shape))
    fb_n = jnp.pad(jnp.broadcast_to(feedback, (b, c, 1)).reshape(1, n), ((0, 0), (0, n_pad - n)))
    depth_n = jnp.pad(jnp.broadcast_to(depth, (b, c, 1)).reshape(1, n), ((0, 0), (0, n_pad - n)))

    n_tiles = n_pad // LANES
    n_chunks = t_pad // t_chunk

    kernel = functools.partial(
        _flanger_kernel, t_chunk=t_chunk, d=d, d_pad=d_pad
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((t_chunk, LANES), lambda ni, tc: (tc, ni)),
            pl.BlockSpec((t_chunk, LANES), lambda ni, tc: (tc, ni)),
            pl.BlockSpec((1, LANES), lambda ni, tc: (0, ni)),
            pl.BlockSpec((1, LANES), lambda ni, tc: (0, ni)),
        ],
        out_specs=pl.BlockSpec((t_chunk, LANES), lambda ni, tc: (tc, ni)),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d_pad, LANES), jnp.float32)],
        interpret=interpret,
    )(x_tn, delay_tn, fb_n, depth_n)

    out = out[:t, :n].T.reshape(b, c, t)
    out = (1.0 - mix) * x + mix * out
    return jnp.clip(out, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Phaser allpass cascade
# ---------------------------------------------------------------------------


def _phaser_kernel(
    x_ref,  # (T_chunk, LANES)
    g_ref,  # (T_chunk, LANES) — per-sample TPT gain tan(pi*fc/sr)
    fb_ref,  # (1, LANES)
    out_ref,  # (T_chunk, LANES)
    state_ref,  # (n_stages_pad, LANES) scratch: allpass LP states
    last_ref,  # (1, LANES) scratch: previous output (feedback tap)
    *,
    t_chunk: int,
    n_stages: int,
):
    tc = pl.program_id(1)

    @pl.when(tc == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)
        last_ref[:] = jnp.zeros_like(last_ref)

    fb = fb_ref[0, :]

    def step(i, _):
        x_t = x_ref[i, :]
        g = g_ref[i, :]
        big_g = g / (1.0 + g)
        u = x_t + fb * last_ref[0, :]
        # first-order TPT allpass cascade (allpass = 2*LP - input)
        for nstage in range(n_stages):
            s = state_ref[nstage, :]
            v = big_g * (u - s)
            lp = v + s
            state_ref[nstage, :] = lp + v
            u = 2.0 * lp - u
        last_ref[0, :] = u
        out_ref[i, :] = u
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0)


@functools.partial(jax.jit, static_argnames=("n_stages", "t_chunk", "interpret"))
def phaser_pallas(
    x: jnp.ndarray,
    g_all: jnp.ndarray,
    feedback: jnp.ndarray,
    mix: jnp.ndarray,
    n_stages: int = 6,
    t_chunk: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas implementation of `ops.fx._phaser_scan` (pre-mix).

    x / g_all: (B, C, T); feedback/mix: (B, 1, 1).  Returns the mixed wet
    signal (B, C, T) — clipping stays in `apply_phaser`.
    """
    b, c, t = x.shape
    n = b * c
    n_pad = _round_up(n, LANES)
    t_pad = _round_up(t, t_chunk)
    n_stages_pad = _round_up(n_stages, 8)

    def to_tn(a):
        a = a.reshape(n, t).T
        return jnp.pad(a, ((0, t_pad - t), (0, n_pad - n)))

    x_tn = to_tn(x)
    g_tn = to_tn(jnp.broadcast_to(g_all, x.shape))
    fb_n = jnp.pad(
        jnp.broadcast_to(feedback, (b, c, 1)).reshape(1, n), ((0, 0), (0, n_pad - n))
    )

    kernel = functools.partial(_phaser_kernel, t_chunk=t_chunk, n_stages=n_stages)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // LANES, t_pad // t_chunk),
        in_specs=[
            pl.BlockSpec((t_chunk, LANES), lambda ni, tc: (tc, ni)),
            pl.BlockSpec((t_chunk, LANES), lambda ni, tc: (tc, ni)),
            pl.BlockSpec((1, LANES), lambda ni, tc: (0, ni)),
        ],
        out_specs=pl.BlockSpec((t_chunk, LANES), lambda ni, tc: (tc, ni)),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_stages_pad, LANES), jnp.float32),
            pltpu.VMEM((1, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(x_tn, g_tn, fb_n)

    out = out[:t, :n].T.reshape(b, c, t)
    return (1.0 - mix) * x + mix * out
