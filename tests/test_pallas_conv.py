"""Parity tests for the Pallas tap-concat conv wgrad kernel
(ops/pallas_conv.py) against the XLA autodiff wgrad, in interpret mode
(conftest forces CPU; the on-TPU compiled check lives in
scripts/tpu_parity_gate.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mod_extraction_tpu.ops.pallas_conv import (
    conv2d_wgrad_reference,
    conv2d_wgrad_tapcat,
    make_conv2d_same_pallas_wgrad,
)


def _rand(shape, seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape) * 0.3, dtype)


# trunk-like shapes, shrunk in T for test speed; (B, F, T, ci, co, dil)
CASES = [
    (2, 16, 48, 8, 8, 1),
    (2, 8, 48, 16, 8, 2),
    (1, 8, 96, 8, 8, 4),  # halo 48 < tile_t: 2 dy copies
]


@pytest.mark.parametrize("b,f,t,ci,co,dil", CASES)
def test_wgrad_matches_xla(b, f, t, ci, co, dil):
    x = _rand((b, f, t, ci), 0)
    dy = _rand((b, f, t, co), 1)
    ref = conv2d_wgrad_reference(x, dy, dil=dil)
    got = conv2d_wgrad_tapcat(
        x, dy, dil=dil, tile_t=32, chunk_f=4, interpret=True
    )
    assert got.shape == (5, 13, ci, co)
    # bf16 operands in the kernel vs f32 reference: tolerance scaled to
    # the contraction magnitude
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(
        np.asarray(got) / scale, np.asarray(ref) / scale, atol=2e-2
    )


def test_wgrad_multi_copy_halo():
    # halo (12*dil) > tile_t exercises the 3-copy dy path (trunk L5:
    # dil=16, tile_t=96 -> halo 192)
    b, f, t, ci, co, dil = 1, 8, 128, 8, 8, 4
    x = _rand((b, f, t, ci), 2)
    dy = _rand((b, f, t, co), 3)
    ref = conv2d_wgrad_reference(x, dy, dil=dil)
    got = conv2d_wgrad_tapcat(
        x, dy, dil=dil, tile_t=16, chunk_f=8, interpret=True
    )
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(
        np.asarray(got) / scale, np.asarray(ref) / scale, atol=2e-2
    )


@pytest.mark.parametrize(
    "b,f,t,ci,co,dil",
    [
        (1, 32, 64, 8, 8, 1),   # f<=64 branch: tile_t=96
        (1, 168, 48, 8, 8, 2),  # f>160 branch: tile_t=32
    ],
)
def test_wgrad_auto_tile_t(b, f, t, ci, co, dil):
    """tile_t=None auto-selection (ADVICE r3 #2): the stepped 96/64/32
    default must pick a valid tiling at every branch, including f>160."""
    x = _rand((b, f, t, ci), 7)
    dy = _rand((b, f, t, co), 8)
    ref = conv2d_wgrad_reference(x, dy, dil=dil)
    got = conv2d_wgrad_tapcat(x, dy, dil=dil, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(
        np.asarray(got) / scale, np.asarray(ref) / scale, atol=2e-2
    )


def test_custom_vjp_conv_grads_match():
    """The full custom-VJP conv: fwd identical, dx identical to XLA,
    dw from the Pallas kernel."""
    from mod_extraction_tpu.ops.conv import conv2d_same

    b, f, t, ci, co, dil = 2, 8, 48, 8, 8, 2
    x = _rand((b, f, t, ci), 4)
    w = _rand((5, 13, ci, co), 5) * 0.1
    g = _rand((b, f, t, co), 6)

    conv = make_conv2d_same_pallas_wgrad(dil, interpret=True)

    y = conv(x, w)
    y_ref = conv2d_same(x, w, 1, dil, preferred=None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)

    def loss(fn, x, w):
        return jnp.sum(fn(x, w) * g)

    dx, dw = jax.grad(lambda x, w: loss(conv, x, w), argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(
        lambda x, w: loss(lambda a, b: conv2d_same(a, b, 1, dil, preferred=None), x, w),
        argnums=(0, 1),
    )(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), atol=1e-5)
    scale = float(jnp.max(jnp.abs(dw_r))) + 1e-6
    np.testing.assert_allclose(
        np.asarray(dw) / scale, np.asarray(dw_r) / scale, atol=2e-2
    )


@pytest.mark.parametrize("dil", [1, 2, 4, 8, 16])
def test_wgrad_s2b_matches_xla(dil):
    """The space-to-batch wgrad framing (ops/conv.py) equals the XLA
    autodiff wgrad up to f32 accumulation order, at every trunk
    dilation (round-5 throughput work)."""
    from mod_extraction_tpu.ops.conv import (
        conv2d_wgrad_convform,
        conv2d_wgrad_s2b,
    )

    b, f, t, ci, co = 2, 8, 57, 5, 7  # T deliberately not a dil multiple
    x = _rand((b, f, t, ci), 10 + dil)
    dy = _rand((b, f, t, co), 20 + dil)
    ref = conv2d_wgrad_reference(x, dy, dil=dil)
    for fn in (conv2d_wgrad_convform, conv2d_wgrad_s2b):
        got = fn(x, dy, 5, 13, dil)
        assert got.shape == (5, 13, ci, co)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(got) / scale, np.asarray(ref) / scale, atol=1e-5
        )


def test_custom_vjp_s2b_grads_match():
    """make_conv2d_custom(wgrad_impl='s2b') + bias: fwd/dx/db identical
    to autodiff, dw from the s2b framing."""
    from mod_extraction_tpu.ops.conv import conv2d_same
    from mod_extraction_tpu.ops.pallas_conv import make_conv2d_custom

    b, f, t, ci, co, dil = 2, 8, 48, 8, 8, 4
    x = _rand((b, f, t, ci), 7)
    w = _rand((5, 13, ci, co), 8) * 0.1
    bias = _rand((co,), 9) * 0.1
    g = _rand((b, f, t, co), 11)

    conv = make_conv2d_custom(dil, wgrad_impl="s2b", with_bias=True)

    def loss(fn, x, w, bias):
        return jnp.sum(fn(x, w, bias) * g)

    def ref_fn(a, ww, bb):
        return conv2d_same(a, ww, 1, dil, preferred=None) + bb

    y = conv(x, w, bias)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref_fn(x, w, bias)), atol=1e-5
    )
    grads = jax.grad(lambda *a: loss(conv, *a), argnums=(0, 1, 2))(x, w, bias)
    refs = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2))(x, w, bias)
    for got_g, ref_g in zip(grads, refs):
        scale = float(jnp.max(jnp.abs(ref_g))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(got_g) / scale, np.asarray(ref_g) / scale, atol=1e-5
        )
