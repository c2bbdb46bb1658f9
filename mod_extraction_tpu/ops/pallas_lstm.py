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

Two kernel families live here:

* `lstm_effect_forward` (this kernel) — the no-gradient paths:
  validation full-sequence forward, TBPTT warmup, streaming inference.
* the custom-VJP TRAINING kernels (`_lstm_train`, further down) — the
  TBPTT default (`train/tbptt_task.py`, `lstm_impl="auto"` resolves to
  them for hid<=256): the forward kernel stashes per-step (h, c, gate)
  tensors and the backward kernel walks time in reverse entirely in
  VMEM, ~17x faster than differentiating the scan (ROUND_NOTES r4).

Parity vs the scan (fwd, loss, and grads for the training kernels) is
tested in interpret mode and on the real chip
(`scripts/tpu_parity_gate.py`).
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


# ---------------------------------------------------------------------------
# Training: custom-VJP path.  The forward additionally saves per-step
# (h, c) residuals; the backward kernel walks time in REVERSE (the grid
# index map flips the time axis), recomputes the gates from the saved
# h_{t-1} (two extra matmuls instead of 4H*B*T of saved activations),
# and accumulates weight gradients directly into constant-index output
# blocks, which stay resident in VMEM for the whole grid.
# ---------------------------------------------------------------------------


def _lstm_fwd_train_kernel(
    seq_ref, x_ref, h0_ref, c0_ref, wih_ref, whh_ref, b_ref, fcw_ref, fcb_ref,
    y_ref, hn_ref, cn_ref, hs_ref, cs_ref,  # hs/cs: per-step residuals
    h_scr, c_scr,
    *, t_chunk: int, hid: int, in_dim: int, out_ch: int, t_total: int,
):
    tc = pl.program_id(1)
    n_tc = pl.num_programs(1)

    @pl.when(tc == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    wih = wih_ref[:]  # (4H, in_dim_pad); padded cols are zero
    whh = whh_ref[:]
    b = b_ref[0, :]
    fcw = fcw_ref[:, :out_ch]
    fcb = fcb_ref[0, :out_ch]

    def step(i, _):
        x_in = seq_ref[i]  # (in_dim_pad, B); padded rows are zero
        h = h_scr[:]
        c = c_scr[:]
        gates = (
            jax.lax.dot_general(wih, x_in, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(whh, h, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            + b[:, None]
        )
        gi = jax.nn.sigmoid(gates[0 * hid : 1 * hid])
        gf = jax.nn.sigmoid(gates[1 * hid : 2 * hid])
        gg = jnp.tanh(gates[2 * hid : 3 * hid])
        go = jax.nn.sigmoid(gates[3 * hid : 4 * hid])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)
        valid = (tc * t_chunk + i) < t_total
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        h_scr[:] = h
        c_scr[:] = c
        hs_ref[i] = h
        cs_ref[i] = c
        for oc in range(out_ch):
            y = jnp.sum(h * fcw[:, oc][:, None], axis=0) + fcb[oc]
            y_ref[i, oc, :] = jnp.tanh(y + x_ref[i, oc, :])
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0)

    @pl.when(tc == n_tc - 1)
    def _():
        hn_ref[:] = h_scr[:]
        cn_ref[:] = c_scr[:]


def _lstm_bwd_kernel(
    seq_ref,  # (t_chunk, in_dim_pad, B) — reversed time chunks via index map
    hs_ref,  # (t_chunk, hid, B) saved h
    cs_ref,  # (t_chunk, hid, B) saved c
    hb_ref,  # (1, hid, B) state at this chunk's entry (h0 for chunk 0)
    cb_ref,  # (1, hid, B)
    wih_ref,  # (4H, in_dim_pad)
    whh_ref,  # (4H, hid)
    b_ref,  # (8, 4H)
    dh_in_ref,  # (t_chunk, hid, B) per-step dL/dh injections (from fc head)
    dhn_ref, dcn_ref,  # (hid, B) cotangents of the final state
    # outputs
    dseq_ref,  # (t_chunk, in_dim_pad, B)
    dh0_ref, dc0_ref,  # (hid, B)
    dwih_ref,  # (4H, in_dim_pad) — accumulated across the whole grid
    dwhh_ref,  # (4H, hid)
    db_ref,  # (8, 4H)
    # scratch
    dh_scr, dc_scr,  # (hid, B) running state cotangents
    *, t_chunk: int, hid: int, t_total: int,
):
    ni = pl.program_id(0)
    tc = pl.program_id(1)  # 0 = LAST time chunk (reversed index map)
    n_tc = pl.num_programs(1)

    @pl.when(jnp.logical_and(ni == 0, tc == 0))
    def _():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(tc == 0)
    def _():
        dh_scr[:] = dhn_ref[:]
        dc_scr[:] = dcn_ref[:]

    wih = wih_ref[:]
    whh = whh_ref[:]
    b = b_ref[0, :]
    chunk0 = (n_tc - 1 - tc) * t_chunk  # global index of this chunk's step 0

    def step(j, _):
        i = t_chunk - 1 - j  # walk the chunk backwards
        g_idx = chunk0 + i
        x_in = seq_ref[i]  # (in_dim_pad, B); padded rows are zero
        c_t = cs_ref[i]
        # previous state: saved step i-1 within the chunk, or the chunk's
        # entry state (streamed in; covers both chunk and sequence starts)
        iprev = jnp.maximum(i - 1, 0)
        at_entry = i == 0
        h_prev = jnp.where(at_entry, hb_ref[0], hs_ref[pl.ds(iprev, 1)][0])
        c_prev = jnp.where(at_entry, cb_ref[0], cs_ref[pl.ds(iprev, 1)][0])

        # recompute gates (cheaper than saving 4H*B activations per step)
        gates = (
            jax.lax.dot_general(wih, x_in, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(whh, h_prev, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            + b[:, None]
        )
        gi = jax.nn.sigmoid(gates[0 * hid : 1 * hid])
        gf = jax.nn.sigmoid(gates[1 * hid : 2 * hid])
        gg = jnp.tanh(gates[2 * hid : 3 * hid])
        go = jax.nn.sigmoid(gates[3 * hid : 4 * hid])

        valid = g_idx < t_total
        dh_old = dh_scr[:]
        dc_old = dc_scr[:]
        dh = dh_old + jnp.where(valid, dh_in_ref[i], 0.0)

        tanh_c = jnp.tanh(c_t)
        do = dh * tanh_c
        dc = dc_old + dh * go * (1.0 - tanh_c * tanh_c)
        di = dc * gg
        dg = dc * gi
        df = dc * c_prev
        dc_prev = dc * gf
        # pre-activation gate grads, stacked in torch (i, f, g, o) order
        dgates = jnp.concatenate(
            [
                di * gi * (1.0 - gi),
                df * gf * (1.0 - gf),
                dg * (1.0 - gg * gg),
                do * go * (1.0 - go),
            ],
            axis=0,
        )  # (4H, B)
        dgates = jnp.where(valid, dgates, 0.0)

        # input + recurrent grads
        dseq_ref[i] = jax.lax.dot_general(
            wih, dgates, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (in_dim_pad, B)
        dh_prev = jax.lax.dot_general(
            whh, dgates, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (hid, B)

        # weight grads (contract over batch lanes)
        dwih_ref[:] += jax.lax.dot_general(
            dgates, x_in, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwhh_ref[:] += jax.lax.dot_general(
            dgates, h_prev, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ref[0, :] += jnp.sum(dgates, axis=1)

        # invalid (padded) steps: fwd state didn't advance, so the
        # cotangents pass through untouched
        dh_scr[:] = jnp.where(valid, dh_prev, dh_old)
        dc_scr[:] = jnp.where(valid, dc_prev, dc_old)
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0)

    @pl.when(tc == n_tc - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


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


# ---------------------------------------------------------------------------
# custom-VJP training entry point
# ---------------------------------------------------------------------------

TRAIN_T_CHUNK = 64  # sized so fwd residual blocks double-buffer in VMEM


def _train_t_chunk(hid: int, t: int) -> int:
    """Time-chunk size for the training kernels.

    The dominant VMEM residents are the saved-state blocks,
    (t_chunk, hid, LANES) f32 each for h and c, double-buffered across
    the grid — 2 x 2 x t_chunk*hid*128*4 bytes.  TRAIN_T_CHUNK=64 is
    sized for the shipped hid=64 (2.1 MB per block); larger hidden
    states must shrink the chunk or the 16 MB scoped-VMEM stack overruns
    (hid=160 at t_chunk=64 was 20.85 MB — the round-4 h160 bracket).
    Scale so t_chunk*hid stays at the proven 64*64 working set."""
    if hid > 64:
        chunk = max(8, (TRAIN_T_CHUNK * 64 // hid) // 8 * 8)
    else:
        chunk = TRAIN_T_CHUNK
    return min(chunk, _round_up(t, 8))


def _train_layouts(w_ih, w_hh, b_gates, fc_k, fc_b, x, latent, h0, c0):
    b, out_ch, t = x.shape
    lat_dim = latent.shape[1]
    in_dim = out_ch + lat_dim
    hid = w_hh.shape[0]
    n_pad = _round_up(b, LANES)
    t_chunk = _train_t_chunk(hid, t)
    t_pad = _round_up(t, t_chunk)
    in_dim_pad = _round_up(in_dim, 8)
    out_ch_pad = _round_up(out_ch, 8)

    def to_tcn(a, c_pad=0):
        a = jnp.transpose(a, (2, 1, 0))
        return jnp.pad(a, ((0, t_pad - t), (0, c_pad), (0, n_pad - b)))

    seq = to_tcn(jnp.concatenate([latent, x], axis=1), in_dim_pad - in_dim)
    x_res = to_tcn(x)
    h0p = jnp.pad(h0.T, ((0, 0), (0, n_pad - b)))
    c0p = jnp.pad(c0.T, ((0, 0), (0, n_pad - b)))
    wih_t = jnp.pad(w_ih.T, ((0, 0), (0, in_dim_pad - in_dim)))
    whh_t = w_hh.T
    b_row = jnp.pad(b_gates[None, :], ((0, 7), (0, 0)))
    fcw = jnp.pad(fc_k, ((0, 0), (0, out_ch_pad - out_ch)))
    fcb = jnp.pad(fc_b[None, :], ((0, 7), (0, out_ch_pad - out_ch)))
    dims = dict(
        b=b, out_ch=out_ch, t=t, lat_dim=lat_dim, in_dim=in_dim, hid=hid,
        n_pad=n_pad, t_chunk=t_chunk, t_pad=t_pad, in_dim_pad=in_dim_pad,
        out_ch_pad=out_ch_pad,
    )
    return (seq, x_res, h0p, c0p, wih_t, whh_t, b_row, fcw, fcb), dims


def _train_fwd_impl(w_ih, w_hh, b_gates, fc_k, fc_b, x, latent, h0, c0,
                    interpret: bool):
    ops, d = _train_layouts(w_ih, w_hh, b_gates, fc_k, fc_b, x, latent, h0, c0)
    seq, x_res, h0p, c0p, wih_t, whh_t, b_row, fcw, fcb = ops
    t_chunk, hid, out_ch = d["t_chunk"], d["hid"], d["out_ch"]
    in_dim_pad, out_ch_pad = d["in_dim_pad"], d["out_ch_pad"]
    n_tiles = d["n_pad"] // LANES
    n_chunks = d["t_pad"] // t_chunk

    kernel = functools.partial(
        _lstm_fwd_train_kernel, t_chunk=t_chunk, hid=hid, in_dim=d["in_dim"],
        out_ch=out_ch, t_total=d["t"],
    )
    y, hn, cn, hs, cs = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((t_chunk, in_dim_pad, LANES), lambda ni, tc: (tc, 0, ni)),
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
            pl.BlockSpec((t_chunk, hid, LANES), lambda ni, tc: (tc, 0, ni)),
            pl.BlockSpec((t_chunk, hid, LANES), lambda ni, tc: (tc, 0, ni)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d["t_pad"], out_ch, d["n_pad"]), jnp.float32),
            jax.ShapeDtypeStruct((hid, d["n_pad"]), jnp.float32),
            jax.ShapeDtypeStruct((hid, d["n_pad"]), jnp.float32),
            jax.ShapeDtypeStruct((d["t_pad"], hid, d["n_pad"]), jnp.float32),
            jax.ShapeDtypeStruct((d["t_pad"], hid, d["n_pad"]), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hid, LANES), jnp.float32),
            pltpu.VMEM((hid, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(seq, x_res, h0p, c0p, wih_t, whh_t, b_row, fcw, fcb)
    return y, hn, cn, hs, cs, (seq, x_res, h0p, c0p, wih_t, whh_t, b_row), d


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _lstm_train(w_ih, w_hh, b_gates, fc_k, fc_b, x, latent, h0, c0,
                interpret=False):
    y, hn, cn, _, _, _, d = _train_fwd_impl(
        w_ih, w_hh, b_gates, fc_k, fc_b, x, latent, h0, c0, interpret
    )
    b, out_ch, t = x.shape
    y = jnp.transpose(y[: d["t"], :, : d["b"]], (2, 1, 0))
    return y, hn[:, :b].T, cn[:, :b].T


def _lstm_train_fwd(w_ih, w_hh, b_gates, fc_k, fc_b, x, latent, h0, c0,
                    interpret=False):
    y, hn, cn, hs, cs, ops, d = _train_fwd_impl(
        w_ih, w_hh, b_gates, fc_k, fc_b, x, latent, h0, c0, interpret
    )
    b = d["b"]
    out = (
        jnp.transpose(y[: d["t"], :, :b], (2, 1, 0)),
        hn[:, :b].T,
        cn[:, :b].T,
    )
    res = (hs, cs, ops, fc_k, fc_b, d)
    return out, res


def _lstm_train_bwd(interpret, res, cts):
    hs, cs, ops, fc_k, fc_b, d = res
    seq, x_res, h0p, c0p, wih_t, whh_t, b_row = ops
    dy, dhn, dcn = cts
    b, out_ch, t = d["b"], d["out_ch"], d["t"]
    hid, t_chunk = d["hid"], d["t_chunk"]
    t_pad, n_pad, in_dim_pad = d["t_pad"], d["n_pad"], d["in_dim_pad"]
    lat_dim, in_dim = d["lat_dim"], d["in_dim"]

    # fc head backward over the whole (non-recurrent) time axis in XLA
    dy_p = jnp.pad(
        jnp.transpose(dy, (2, 1, 0)), ((0, t_pad - t), (0, 0), (0, n_pad - b))
    )  # (T_pad, out_ch, N_pad)
    z = jnp.einsum("thb,ho->tob", hs, fc_k) + fc_b[None, :, None]
    y_full = jnp.tanh(z + x_res)
    dz = dy_p * (1.0 - y_full * y_full)  # zero where dy_p is zero (padding)
    dfc_k = jnp.einsum("thb,tob->ho", hs, dz)
    dfc_b = jnp.sum(dz, axis=(0, 2))
    dh_in = jnp.einsum("ho,tob->thb", fc_k, dz)  # (T_pad, hid, N_pad)

    dhn_p = jnp.pad(dhn.T, ((0, 0), (0, n_pad - b)))
    dcn_p = jnp.pad(dcn.T, ((0, 0), (0, n_pad - b)))

    n_tiles = n_pad // LANES
    n_chunks = t_pad // t_chunk
    rev = lambda ni, tc: (n_chunks - 1 - tc, 0, ni)  # reversed time stream

    # per-chunk entry states: h/c right before each chunk's first step
    hb = jnp.concatenate(
        [h0p[None], hs[t_chunk - 1 :: t_chunk][:-1]], axis=0
    )  # (n_chunks, hid, N_pad)
    cb = jnp.concatenate([c0p[None], cs[t_chunk - 1 :: t_chunk][:-1]], axis=0)
    rev_b = lambda ni, tc: (n_chunks - 1 - tc, 0, ni)

    kernel = functools.partial(
        _lstm_bwd_kernel, t_chunk=t_chunk, hid=hid, t_total=t
    )
    dseq, dh0p, dc0p, dwih, dwhh, db = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((t_chunk, in_dim_pad, LANES), rev),
            pl.BlockSpec((t_chunk, hid, LANES), rev),
            pl.BlockSpec((t_chunk, hid, LANES), rev),
            pl.BlockSpec((1, hid, LANES), rev_b),
            pl.BlockSpec((1, hid, LANES), rev_b),
            pl.BlockSpec((4 * hid, in_dim_pad), lambda ni, tc: (0, 0)),
            pl.BlockSpec((4 * hid, hid), lambda ni, tc: (0, 0)),
            pl.BlockSpec((8, 4 * hid), lambda ni, tc: (0, 0)),
            pl.BlockSpec((t_chunk, hid, LANES), rev),
            pl.BlockSpec((hid, LANES), lambda ni, tc: (0, ni)),
            pl.BlockSpec((hid, LANES), lambda ni, tc: (0, ni)),
        ],
        out_specs=[
            pl.BlockSpec((t_chunk, in_dim_pad, LANES), rev),
            pl.BlockSpec((hid, LANES), lambda ni, tc: (0, ni)),
            pl.BlockSpec((hid, LANES), lambda ni, tc: (0, ni)),
            pl.BlockSpec((4 * hid, in_dim_pad), lambda ni, tc: (0, 0)),
            pl.BlockSpec((4 * hid, hid), lambda ni, tc: (0, 0)),
            pl.BlockSpec((8, 4 * hid), lambda ni, tc: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, in_dim_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((hid, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((hid, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((4 * hid, in_dim_pad), jnp.float32),
            jax.ShapeDtypeStruct((4 * hid, hid), jnp.float32),
            jax.ShapeDtypeStruct((8, 4 * hid), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hid, LANES), jnp.float32),
            pltpu.VMEM((hid, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(seq, hs, cs, hb, cb, wih_t, whh_t, b_row, dh_in, dhn_p, dcn_p)

    dseq = dseq[:t, :, :b]  # (T, in_dim_pad, B)
    dlatent = jnp.transpose(dseq[:, :lat_dim, :], (2, 1, 0))
    dx_rec = dseq[:, lat_dim:in_dim, :]  # recurrent path into x
    dx_res = dz[:t, :, :b]  # residual tanh path
    dx = jnp.transpose(dx_rec + dx_res, (2, 1, 0))
    dw_ih = dwih[:, :in_dim].T
    dw_hh = dwhh.T
    db_gates = db[0]
    dh0 = dh0p[:, :b].T
    dc0 = dc0p[:, :b].T
    return (dw_ih, dw_hh, db_gates, dfc_k, dfc_b, dx, dlatent, dh0, dc0)


_lstm_train.defvjp(_lstm_train_fwd, _lstm_train_bwd)


def lstm_effect_model_pallas_train(
    params, x: jnp.ndarray, latent: jnp.ndarray, state, interpret: bool = False
):
    """Differentiable Pallas path with the same contract as
    `LSTMEffectModel.apply` — used inside the TBPTT chunk loss so both the
    forward and backward of the sample-rate recurrence run as fused
    kernels (the gradient chunks are the TBPTT hot loop)."""
    p = params.get("params", params)
    h0, c0 = state
    y, hn, cn = _lstm_train(
        p["w_ih"], p["w_hh"], p["b_gates"], p["fc"]["kernel"], p["fc"]["bias"],
        x, latent, h0, c0, interpret,
    )
    return y, (hn, cn)
