"""Fused Pallas TPU kernel for the LSTM-64 effect model forward pass.

The sample-rate LSTM (reference `mod_extraction/models.py:311-339`, cuDNN
LSTM there) is the framework's second strict per-sample recurrence after
the delay-line effects (SURVEY.md §7.4).  The `lax.scan` path pays XLA
while-loop overhead per audio sample; this kernel keeps ALL weights and
the (h, c) state resident in VMEM and walks time with `fori_loop`,
fusing the whole effect model per step:

    gates = W_ih^T @ [latent; x]_t + W_hh^T @ h + b      (MXU)
    i,f,g,o split -> c = sig(f)*c + sig(i)*tanh(g)       (VPU)
    h = sig(o)*tanh(c)
    y_t = tanh(fc(h) + x_t)                              (VPU reduction)

Layout: batch on the 128-lane axis, hidden (64) + gates (256) on
sublanes.  Grid = (batch tiles, time chunks), time innermost, so the
VMEM state persists across chunks; the incoming (h0, c0) is loaded at
chunk 0 and the final state is written at the last chunk (streaming /
TBPTT-carry correct).

Used on the no-gradient paths (validation full-sequence forward, TBPTT
warmup, streaming inference); training chunks keep the scan so autodiff
applies.  Parity vs the scan is tested in interpret mode and on device.
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


def _lstm_kernel(
    seq_ref,  # (t_chunk, in_dim, LANES) — [latent; x] interleaved
    x_ref,  # (t_chunk, out_ch, LANES) — residual input (audio channels)
    h0_ref,  # (hid, LANES)
    c0_ref,  # (hid, LANES)
    wih_ref,  # (4*hid, in_dim_pad)  (transposed torch layout)
    whh_ref,  # (4*hid, hid)
    b_ref,  # (8, 4*hid) — row 0 is the fused gate bias
    fcw_ref,  # (hid, out_ch_pad)
    fcb_ref,  # (8, out_ch_pad) — row 0 is the fc bias
    y_ref,  # (t_chunk, out_ch, LANES) out
    hn_ref,  # (hid, LANES) out
    cn_ref,  # (hid, LANES) out
    h_scr,  # (hid, LANES) VMEM scratch
    c_scr,  # (hid, LANES) VMEM scratch
    *,
    t_chunk: int,
    hid: int,
    in_dim: int,
    out_ch: int,
    t_total: int,
):
    tc = pl.program_id(1)
    n_tc = pl.num_programs(1)

    @pl.when(tc == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    wih = wih_ref[:, :in_dim]  # (4H, in_dim)
    whh = whh_ref[:]  # (4H, H)
    b = b_ref[0, :]  # (4H,)
    fcw = fcw_ref[:, :out_ch]  # (H, out_ch)
    fcb = fcb_ref[0, :out_ch]  # (out_ch,)

    def step(i, _):
        x_in = seq_ref[i]  # (in_dim, LANES)
        h = h_scr[:]
        c = c_scr[:]
        gates = (
            jax.lax.dot_general(
                wih, x_in, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                whh, h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b[:, None]
        )  # (4H, LANES)
        gi = jax.nn.sigmoid(gates[0 * hid : 1 * hid])
        gf = jax.nn.sigmoid(gates[1 * hid : 2 * hid])
        gg = jnp.tanh(gates[2 * hid : 3 * hid])
        go = jax.nn.sigmoid(gates[3 * hid : 4 * hid])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)
        # steps past the true sequence length (time padding) must not
        # advance the state — the final (h, c) is a streaming carry
        valid = (tc * t_chunk + i) < t_total
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        h_scr[:] = h
        c_scr[:] = c
        # fc + residual + tanh, per output channel (out_ch is 1 in all
        # shipped configs; loop is static)
        for oc in range(out_ch):
            y = jnp.sum(h * fcw[:, oc][:, None], axis=0) + fcb[oc]
            y_ref[i, oc, :] = jnp.tanh(y + x_ref[i, oc, :])
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0)

    @pl.when(tc == n_tc - 1)
    def _():
        hn_ref[:] = h_scr[:]
        cn_ref[:] = c_scr[:]


@functools.partial(
    jax.jit, static_argnames=("t_chunk", "interpret")
)
def lstm_effect_model_pallas(
    params,
    x: jnp.ndarray,
    latent: jnp.ndarray,
    state,
    t_chunk: int = 2048,
    interpret: bool = False,
):
    """Drop-in for `LSTMEffectModel.apply` on the forward path.

    params: the flax params dict ({"params": {...}} or bare) with w_ih
    (in_dim, 4H), w_hh (H, 4H), b_gates (4H,), fc/{kernel,bias}.
    x: (B, out_ch, T) audio; latent: (B, L, T); state: ((B, H), (B, H)).
    Returns (y (B, out_ch, T), (h_n, c_n)).
    """
    p = params.get("params", params)
    w_ih, w_hh, b_gates = p["w_ih"], p["w_hh"], p["b_gates"]
    fc_kernel, fc_bias = p["fc"]["kernel"], p["fc"]["bias"]

    b, out_ch, t = x.shape
    lat_dim = latent.shape[1]
    in_dim = out_ch + lat_dim
    assert w_ih.shape[0] == in_dim, (
        f"effect model expects {w_ih.shape[0]} input channels, got "
        f"{in_dim} (x {out_ch} + latent {lat_dim})"
    )
    hid = w_hh.shape[0]
    h0, c0 = state

    n_pad = _round_up(b, LANES)
    t_chunk = min(t_chunk, _round_up(t, 8))  # short buffers: one chunk
    t_pad = _round_up(t, t_chunk)

    # (T_pad, C, N_pad) layouts, batch on lanes
    def to_tcn(a):
        a = jnp.transpose(a, (2, 1, 0))  # (T, C, B)
        return jnp.pad(a, ((0, t_pad - t), (0, 0), (0, n_pad - b)))

    seq = to_tcn(jnp.concatenate([latent, x], axis=1))  # [latent; x] order
    x_res = to_tcn(x)
    h0p = jnp.pad(h0.T, ((0, 0), (0, n_pad - b)))  # (H, N_pad)
    c0p = jnp.pad(c0.T, ((0, 0), (0, n_pad - b)))

    in_dim_pad = _round_up(in_dim, 8)
    out_ch_pad = _round_up(out_ch, 8)
    wih_t = jnp.pad(w_ih.T, ((0, 0), (0, in_dim_pad - in_dim)))  # (4H, in_pad)
    whh_t = w_hh.T  # (4H, H)
    b_row = jnp.pad(b_gates[None, :], ((0, 7), (0, 0)))  # (8, 4H)
    fcw = jnp.pad(fc_kernel, ((0, 0), (0, out_ch_pad - out_ch)))  # (H, out_pad)
    fcb = jnp.pad(fc_bias[None, :], ((0, 7), (0, out_ch_pad - out_ch)))

    n_tiles = n_pad // LANES
    n_chunks = t_pad // t_chunk
    kernel = functools.partial(
        _lstm_kernel, t_chunk=t_chunk, hid=hid, in_dim=in_dim, out_ch=out_ch,
        t_total=t,
    )
    grid = (n_tiles, n_chunks)
    y, hn, cn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_chunk, in_dim, LANES), lambda ni, tc: (tc, 0, ni)),
            pl.BlockSpec((t_chunk, out_ch, LANES), lambda ni, tc: (tc, 0, ni)),
            pl.BlockSpec((hid, LANES), lambda ni, tc: (0, ni)),
            pl.BlockSpec((hid, LANES), lambda ni, tc: (0, ni)),
            pl.BlockSpec((4 * hid, in_dim_pad), lambda ni, tc: (0, 0)),
            pl.BlockSpec((4 * hid, hid), lambda ni, tc: (0, 0)),
            pl.BlockSpec((8, 4 * hid), lambda ni, tc: (0, 0)),
            pl.BlockSpec((hid, out_ch_pad), lambda ni, tc: (0, 0)),
            pl.BlockSpec((8, out_ch_pad), lambda ni, tc: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((t_chunk, out_ch, LANES), lambda ni, tc: (tc, 0, ni)),
            pl.BlockSpec((hid, LANES), lambda ni, tc: (0, ni)),
            pl.BlockSpec((hid, LANES), lambda ni, tc: (0, ni)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, out_ch, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((hid, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((hid, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hid, LANES), jnp.float32),
            pltpu.VMEM((hid, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(seq, x_res, h0p, c0p, wih_t, whh_t, b_row, fcw, fcb)

    y = jnp.transpose(y[:t, :, :b], (2, 1, 0))  # (B, out_ch, T)
    return y, (hn[:, :b].T, cn[:, :b].T)
