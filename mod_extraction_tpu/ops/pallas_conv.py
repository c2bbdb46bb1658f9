"""Pallas TPU kernel for the Spectral2DCNN trunk conv weight gradient.

Why this exists (throughput work, VERDICT r2 weak #2): the trunk convs
are (5, 13) kernels with 64 channels (`/root/reference/mod_extraction/
models.py:183-192`).  XLA frames the weight gradient as a contraction
whose matmul output is (kernel_taps*ci, co) with co = 64 — half the
MXU's 128 output lanes idle.  This kernel reframes wgrad as ONE
accumulated matmul

    W  =  A^T @ B,   A: (K, kf*ci) = (K, 320),   B: (K, kt*co) = (K, 832)

where K = B*F*T is the contraction over every (batch, freq, time)
position, A carries the kf=5 FREQ taps of x in its columns and B the
kt=13 TIME taps of dy in its columns.  Both matmul dimensions now fill
128-lane tiles, and each (A, B) row pair is built on the fly in VMEM
from plain shifted reads of x / dy tiles — HBM traffic stays ~1x each
operand (plus one padding pass).

Derivation of the tap algebra (same-padded conv, time dilation `dil`):

    W[a, j, ci, co] = sum_{b,f,t} xp[b, f+a, t + j*dil, ci] * dy[b,f,t,co]

with xp = x padded (2, 2) in freq and (6*dil, 6*dil) in time.  Putting
v = t + j*dil and extending dy with 12*dil zeros on both sides (dyp):

    W[a, j] = sum_{v in [0, Tx)} xp[v] * dyp[v + (12 - j) * dil]

so every time tap becomes a static offset read of dyp — no per-tap
reshuffle of x.  The freq taps are static offset reads of xp rows.

Grid: (B, time-tiles), W accumulated in the revisited fp32 output block
(TPU grids run sequentially, so cross-step accumulation is safe).  The
time halo (12*dil columns of dyp) is covered by passing dyp a second
(and for 12*dil > tile_t a third) time with the block index shifted by
one tile — overlapping windows without overlapping BlockSpecs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _wgrad_kernel(
    x_ref,  # (1, F + kf - 1, tile_t, ci)
    *dy_refs,  # n_copies x (1, F, tile_t, co); out_ref, then kwargs
    out_ref=None,
    kf: int,
    kt: int,
    dil: int,
    f: int,
    chunk_f: int,
    tile_t: int,
    ci: int,
    co: int,
):
    b = pl.program_id(0)
    vt = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, vt == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    halo = (kt - 1) * dil
    acc = jnp.zeros_like(out_ref)
    for fc in range(0, f, chunk_f):
        cf = min(chunk_f, f - fc)
        # A: kf freq-shifted slices of x -> (cf*tile_t, kf*ci)
        a_cols = [
            x_ref[0, fc + a : fc + a + cf, :, :].reshape(cf * tile_t, ci)
            for a in range(kf)
        ]
        a_mat = jnp.concatenate(a_cols, axis=-1)
        # halo window dyp[v0 : v0 + tile_t + halo], rows fc..fc+cf only —
        # concatenating the copies at full height blew the 16 MB scoped
        # VMEM at the trunk's F=128 layer, so slice rows BEFORE joining
        dyw = jnp.concatenate(
            [r[0, fc : fc + cf] for r in dy_refs], axis=1
        )  # (cf, n*tile_t, co)
        # B: kt time-shifted slices of dy -> (cf*tile_t, kt*co)
        b_cols = [
            dyw[:, (halo - j * dil) : (halo - j * dil) + tile_t, :].reshape(
                cf * tile_t, co
            )
            for j in range(kt)
        ]
        b_mat = jnp.concatenate(b_cols, axis=-1)
        acc = acc + jax.lax.dot_general(
            a_mat,
            b_mat,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


@functools.partial(
    jax.jit,
    static_argnames=("kf", "kt", "dil", "tile_t", "chunk_f", "interpret"),
)
def conv2d_wgrad_tapcat(
    x: jnp.ndarray,
    dy: jnp.ndarray,
    kf: int = 5,
    kt: int = 13,
    dil: int = 1,
    tile_t: int | None = None,
    chunk_f: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Weight gradient of `ops.conv.conv2d_same` w.r.t. its kernel.

    x: (B, F, T, ci) conv input, dy: (B, F, T, co) output cotangent.
    Returns (kf, kt, ci, co) float32.  Matches
    `jax.grad` of `conv2d_same(x, w, 1, dil)` (bin dilation 1 — all
    shipped Spectral2DCNN configs).
    """
    bsz, f, t, ci = x.shape
    _, f2, t2, co = dy.shape
    assert (f, t) == (f2, t2), (x.shape, dy.shape)
    assert kf % 2 == 1 and kt % 2 == 1
    if tile_t is None:
        # VMEM working set scales with f * tile_t (the dyw halo concat,
        # the dy blocks, and the x block): tile_t=96 at the trunk's
        # F=128 layer overruns the 16 MB scoped-vmem stack (measured
        # 18.2 MB) — step the tile down as f grows.
        tile_t = 96 if f <= 64 else (64 if f <= 160 else 32)
    hf = kf // 2  # freq halo (2)
    ht = (kt // 2) * dil  # time halo one side (6*dil)
    halo = (kt - 1) * dil  # 12*dil

    # xp: freq pad (hf, hf); time pad (ht, ht) then round Tx up to tiles
    tx = t + 2 * ht
    tx_pad = _round_up(tx, tile_t)
    x_p = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (hf, hf), (ht, tx_pad - t - ht), (0, 0)),
    )
    n_vt = tx_pad // tile_t
    n_copies = halo // tile_t + 2 if halo % tile_t else halo // tile_t + 1
    # dyp: time pad (halo, ...) so dyp[v + halo - j*dil] is in range for
    # v < tx_pad across all passed copies
    dy_len = tx_pad + (n_copies - 1) * tile_t
    dy_p = jnp.pad(
        dy.astype(jnp.bfloat16),
        ((0, 0), (0, 0), (halo, dy_len - t - halo), (0, 0)),
    )

    kernel = functools.partial(
        _wgrad_kernel,
        kf=kf,
        kt=kt,
        dil=dil,
        f=f,
        chunk_f=min(chunk_f, f),
        tile_t=tile_t,
        ci=ci,
        co=co,
    )

    def dy_spec(k):
        return pl.BlockSpec(
            (1, f, tile_t, co), lambda b, vt, k=k: (b, 0, vt + k, 0)
        )

    from jax.experimental.pallas import tpu as pltpu

    w_flat = pl.pallas_call(
        # out_ref arrives positionally after inputs; adapt signature
        lambda x_ref, *rest: kernel(x_ref, *rest[:-1], out_ref=rest[-1]),
        grid=(bsz, n_vt),
        # the double-buffered, lane-padded blocks at the trunk's F=128
        # layer need ~17 MB — above Mosaic's 16 MB default scoped-vmem
        # budget but far under the chip's 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((1, f + kf - 1, tile_t, ci), lambda b, vt: (b, 0, vt, 0)),
            *[dy_spec(k) for k in range(n_copies)],
        ],
        out_specs=pl.BlockSpec(
            (kf * ci, kt * co), lambda b, vt: (0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((kf * ci, kt * co), jnp.float32),
        interpret=interpret,
    )(x_p, *([dy_p] * n_copies))

    # rows (a, ci), cols (j, co) -> (kf, kt, ci, co)
    w = w_flat.reshape(kf, ci, kt, co)
    return jnp.transpose(w, (0, 2, 1, 3))


def conv2d_wgrad_reference(x, dy, kf=5, kt=13, dil=1):
    """Slow reference (pure XLA) for tests: grad of conv2d_same."""
    from mod_extraction_tpu.ops.conv import conv2d_same

    def loss(w):
        y = conv2d_same(x.astype(jnp.float32), w, 1, dil, preferred=jnp.float32)
        return jnp.sum(y * dy.astype(jnp.float32))

    ci, co = x.shape[-1], dy.shape[-1]
    w0 = jnp.zeros((kf, kt, ci, co), jnp.float32)
    return jax.grad(loss)(w0)


def make_conv2d_custom(
    dil: int,
    fwd_impl: str = "lax",
    dgrad_impl: str = "lax",
    wgrad_impl: str = "pallas",
    interpret: bool = False,
    with_bias: bool = False,
    barrier: bool = False,
):
    """conv2d_same(x, w, 1, dil) with an explicitly chosen backward.

    fwd_impl / dgrad_impl: "lax" (plain conv) or "pair" (the row-pair
    freq-stride-2 conv, ops/conv.py::conv2d_pair_rows — 1.2x MACs,
    full 128 output lanes).  dgrad is itself a same-conv of the output
    cotangent with the freq/time-flipped channel-transposed kernel, so
    the same pairing applies.  wgrad_impl: "xla" (autodiff framing) or
    "pallas" (the tap-concat kernel above).

    with_bias: the returned callable takes (x, w, b) and computes
    conv + b, with db = sum(g) in the custom backward.

    barrier: wrap the incoming cotangent in `lax.optimization_barrier`
    so it is materialized ONCE.  Without it XLA re-fuses the cotangent's
    producer chain (max-pool eq-mask backward + PReLU backward, each
    reading full pre-pool activations) separately into the wgrad, dgrad,
    and dbias consumers — measured 2x2.17 GB of duplicated HBM traffic
    at the trunk's F=256 layer alone (round-4 trace: two
    bf16[128,128,2,345,64] broadcasts + 4.3 GB dbias + 4.4 GB wgrad
    passes for a 187 GFLOP layer).  The barrier converts recompute into
    one bf16 buffer write + three reads.

    Returns a (x, w[, b]) -> y callable."""
    from mod_extraction_tpu.ops.conv import conv2d_pair_rows, conv2d_same

    def one_conv(impl, x, w):
        if impl == "pair":
            return conv2d_pair_rows(x, w, 1, dil, preferred=None)
        return conv2d_same(x, w, 1, dil, preferred=None)

    @jax.custom_vjp
    def conv(x, w):
        return one_conv(fwd_impl, x, w)

    def fwd(x, w):
        return conv(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        if barrier:
            g = jax.lax.optimization_barrier(g)
        if dgrad_impl in ("lax", "pair"):
            # dx = same-conv of g with the flipped, channel-transposed
            # kernel (odd kernel dims keep 'same' padding symmetric)
            w_t = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))
            dx = one_conv(dgrad_impl, g, w_t).astype(x.dtype)
        else:  # autodiff framing of the fwd conv
            _, vjp = jax.vjp(lambda xx: one_conv(fwd_impl, xx, w), x)
            (dx,) = vjp(g)
        if wgrad_impl == "pallas":
            dw = conv2d_wgrad_tapcat(
                x, g, kf=w.shape[0], kt=w.shape[1], dil=dil,
                interpret=interpret,
            )
        elif wgrad_impl == "s2b":
            # space-to-batch framing (ops/conv.py): dense stride-1
            # filter-grad contraction over batch B*dil
            from mod_extraction_tpu.ops.conv import conv2d_wgrad_s2b

            dw = conv2d_wgrad_s2b(x, g, w.shape[0], w.shape[1], dil)
        else:
            # XLA's own wgrad framing of the plain conv (the pair conv's
            # autodiff wgrad would target the padded (6, kt, C, 2Co)
            # kernel for no benefit)
            _, vjp = jax.vjp(
                lambda ww: conv2d_same(x, ww, 1, dil, preferred=None), w
            )
            (dw,) = vjp(g)
        return dx, dw.astype(w.dtype)

    conv.defvjp(fwd, bwd)
    if not with_bias:
        return conv

    @jax.custom_vjp
    def conv_bias(x, w, b):
        y = one_conv(fwd_impl, x, w)
        return y + b.astype(y.dtype)

    def fwd_b(x, w, b):
        return conv_bias(x, w, b), (x, w)

    def bwd_b(res, g):
        x, w = res
        if barrier:
            g = jax.lax.optimization_barrier(g)
        # db accumulated in f32 (the bias param is f32; summing the bf16
        # cotangent in f32 only improves on the autodiff framing)
        db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
        dx, dw = bwd((x, w), g)
        return dx, dw, db

    conv_bias.defvjp(fwd_b, bwd_b)
    return conv_bias


def make_conv2d_same_pallas_wgrad(dil: int, interpret: bool = False):
    """conv2d_same(x, w, 1, dil) with a custom VJP: XLA fwd + XLA dgrad,
    Pallas tap-concat wgrad.  Returns a (x, w) -> y callable."""
    return make_conv2d_custom(
        dil, fwd_impl="lax", dgrad_impl="autodiff", wgrad_impl="pallas",
        interpret=interpret,
    )


def pair_supported(w_shape, bin_dil: int, f: int) -> bool:
    """True when the row-pair fwd/dgrad formulation covers this conv."""
    return w_shape[0] == 5 and bin_dil == 1 and f % 2 == 0


def wgrad_supported(w_shape, bin_dil: int, ci: int) -> bool:
    """True when the tap-concat wgrad kernel covers this conv: bin
    dilation 1 and lane-aligned channels (the trunk's 64/64; L0's ci=2
    stays on the XLA path — its wgrad is <2% of the stack's FLOPs)."""
    kf, kt = w_shape[0], w_shape[1]
    return bin_dil == 1 and kf % 2 == 1 and kt % 2 == 1 and ci % 8 == 0 and ci >= 8
