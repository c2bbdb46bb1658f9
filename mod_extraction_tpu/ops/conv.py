"""Conv formulations for the Spectral2DCNN trunk.

The paper model's convs are (5, 13) kernels over (freq, time) with 64
channels (`/root/reference/mod_extraction/models.py:183-192`).  On TPU,
64 channels fill only half the MXU's 128 lanes, which caps the conv's
MXU utilization; `conv2d_freq_folded` computes the SAME conv as a
(3, 13) conv on a freq-row-pair-folded layout with 128 channels:

    x (B, F, T, C) -> x_f (B, F/2, T, 2C)   [row parity -> channel block]
    w (5, kt, C, Co) -> w_f (3, kt, 2C, 2Co) [block-structured scatter]

1.2x the MACs (the folded weight is 5/6 dense), but every matmul runs
with full lanes.  Exact same math — the weights are the model's own
(5, 13) kernel, folded at apply time (the fold is O(kernel) work).

`conv2d_same` is the plain lax.conv path (the default)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def same_pads_1d(k: int, d: int) -> tuple[int, int]:
    span = (k - 1) * d
    return (span // 2, span - span // 2)


def conv2d_same(x, w, bin_dil: int, temp_dil: int, preferred=jnp.float32):
    """'same'-padded NHWC conv, kernel HWIO."""
    kf, kt = w.shape[0], w.shape[1]
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=(same_pads_1d(kf, bin_dil), same_pads_1d(kt, temp_dil)),
        rhs_dilation=(bin_dil, temp_dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def fold_freq(x: jnp.ndarray) -> jnp.ndarray:
    """(B, F, T, C) -> (B, F/2, T, 2C); row parity r -> channels [rC, rC+C)."""
    b, f, t, c = x.shape
    assert f % 2 == 0, f"freq dim {f} must be even to fold"
    x = x.reshape(b, f // 2, 2, t, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(b, f // 2, t, 2 * c)


def unfold_freq(x: jnp.ndarray) -> jnp.ndarray:
    b, g, t, c2 = x.shape
    c = c2 // 2
    x = x.reshape(b, g, t, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(b, 2 * g, t, c)


def fold_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(5, kt, C, Co) -> (3, kt, 2C, 2Co).

    Output subrow r_out of folded row g is original row 2g + r_out; its
    freq tap delta reads original row 2g + r_out + delta, i.e. folded
    row offset floor((r_out+delta)/2) and input channel block
    (r_out+delta) mod 2."""
    kf, kt, c, co = w.shape
    assert kf == 5, f"freq folding is specialized to kernel 5, got {kf}"
    wf = jnp.zeros((3, kt, 2 * c, 2 * co), w.dtype)
    for r_out in (0, 1):
        for delta in range(-2, 3):
            d = r_out + delta
            kr = d // 2 + 1
            r_in = d % 2
            wf = wf.at[
                kr, :, r_in * c : (r_in + 1) * c, r_out * co : (r_out + 1) * co
            ].add(w[delta + 2])
    return wf


def conv2d_freq_folded(x, w, bin_dil: int, temp_dil: int,
                       preferred=jnp.float32):
    """(5, kt) 'same' conv computed in the freq-folded layout.

    Requires bin_dil == 1 (all shipped configs) and an even freq dim.
    Returns exactly conv2d_same(x, w, 1, temp_dil) up to matmul
    accumulation order."""
    assert bin_dil == 1, "freq folding requires bin dilation 1"
    kt = w.shape[1]
    xf = fold_freq(x)
    wf = fold_weights(w)
    yf = jax.lax.conv_general_dilated(
        xf,
        wf,
        window_strides=(1, 1),
        padding=((1, 1), same_pads_1d(kt, temp_dil)),
        rhs_dilation=(1, temp_dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )
    return unfold_freq(yf)


def foldable(w_shape, bin_dil: int, f: int) -> bool:
    """True when the freq-folded path computes this conv."""
    return w_shape[0] == 5 and bin_dil == 1 and f % 2 == 0


def conv2d_wgrad_convform(x, dy, kf: int, kt: int, dil: int):
    """Weight gradient of `conv2d_same(x, w, 1, dil)` expressed manually
    as ONE strided conv (round-5 throughput work, probe_wgrad_xla.py
    formulation B):

        dW[a, j, ci, co] = sum_{b,f,t} xp[b, f+a, t+j*dil, ci]
                                       * dy[b, f, t, co]

    with lhs batch dim <- ci, contraction feature <- b, output spatial
    <- (a, j) at lhs stride (1, dil).  Bit-identical contraction to
    XLA's own backprop-filter framing; exists so the `s2b` path below
    has a dense stride-1 core to call and as an A/B control."""
    xp = jnp.pad(
        x, ((0, 0), same_pads_1d(kf, 1), same_pads_1d(kt, dil), (0, 0))
    )
    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(3, 0, 1, 2),  # batch<-ci, feature<-b, spatial (f, t)
        rhs_spec=(3, 0, 1, 2),  # out-feat<-co, in-feat<-b, spatial (f, t)
        out_spec=(0, 3, 1, 2),  # (ci, a, j, co)
    )
    dw = jax.lax.conv_general_dilated(
        xp,
        dy,
        window_strides=(1, dil),
        padding="VALID",
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return jnp.transpose(dw, (1, 2, 0, 3))


def conv2d_wgrad_s2b(x, dy, kf: int, kt: int, dil: int):
    """`conv2d_wgrad_convform` with the time dilation folded into the
    batch dim (space-to-batch): t = u*dil + r maps (B, r) -> batch
    B*dil, turning the stride-`dil` filter-gradient contraction into a
    DENSE stride-1 one over time length ~T/dil.  Same contraction up to
    f32 accumulation order; selectable as `wgrad_impl="s2b"` on the
    trunk convs."""
    if dil == 1:
        return conv2d_wgrad_convform(x, dy, kf, kt, 1)
    b, f, t, ci = x.shape
    tp = -(-t // dil) * dil  # pad T up to a dilation multiple
    pt = same_pads_1d(kt, dil)
    xp = jnp.pad(
        x, ((0, 0), same_pads_1d(kf, 1), (pt[0], pt[1] + tp - t), (0, 0))
    )
    dyp = jnp.pad(dy, ((0, 0), (0, 0), (0, tp - t), (0, 0)))
    u_x = tp // dil + (kt - 1)
    u_y = tp // dil

    def to_phases(a, u):
        bb, ff, _, cc = a.shape
        a = a.reshape(bb, ff, u, dil, cc)
        a = jnp.transpose(a, (0, 3, 1, 2, 4))
        return a.reshape(bb * dil, ff, u, cc)

    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(3, 0, 1, 2),
        rhs_spec=(3, 0, 1, 2),
        out_spec=(0, 3, 1, 2),
    )
    dw = jax.lax.conv_general_dilated(
        to_phases(xp, u_x),
        to_phases(dyp, u_y),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return jnp.transpose(dw, (1, 2, 0, 3))


def pair_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(5, kt, C, Co) -> (6, kt, C, 2Co) for the row-pair strided conv.

    Output channel block r (row parity) gets the original taps shifted
    down by r: w2[a', j, c, r*Co + o] = w[a' - r, j, c, o] where valid."""
    kf, kt, c, co = w.shape
    assert kf == 5, f"row pairing is specialized to kernel 5, got {kf}"
    w2 = jnp.zeros((6, kt, c, 2 * co), w.dtype)
    w2 = w2.at[0:5, :, :, 0:co].set(w)
    w2 = w2.at[1:6, :, :, co : 2 * co].set(w)
    return w2


def conv2d_pair_rows(x, w, bin_dil: int, temp_dil: int,
                     preferred=jnp.float32):
    """(5, kt) 'same' conv as ONE freq-stride-2 conv with 2*Co channels.

    Unlike `conv2d_freq_folded` (2.4x MACs: both channel dims doubled at
    F/2 positions), this costs 1.2x the MACs — 6 freq taps x 2Co output
    channels at F/2 output positions — while filling the MXU's 128
    output lanes (2*64) instead of 64.  Two adjacent output rows share
    one matmul: y[2p + r] is output-channel block r of strided-conv
    position p.  Requires bin_dil == 1 and an even freq dim; exact same
    math as conv2d_same up to accumulation order."""
    assert bin_dil == 1, "row pairing requires bin dilation 1"
    b, f, t, c = x.shape
    assert f % 2 == 0, f"freq dim {f} must be even to pair"
    kt = w.shape[1]
    co = w.shape[3]
    w2 = pair_weights(w)
    y2 = jax.lax.conv_general_dilated(
        x,
        w2,
        window_strides=(2, 1),
        padding=((2, 2), same_pads_1d(kt, temp_dil)),
        rhs_dilation=(1, temp_dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )
    y2 = y2.reshape(b, f // 2, t, 2, co)
    return jnp.transpose(y2, (0, 1, 3, 2, 4)).reshape(b, f, t, co)
