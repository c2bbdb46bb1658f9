"""Freq-folded conv path (ops/conv.py): exact-math equivalence with the
plain lax conv, both at the op level and through the full Spectral2DCNN
trunk with shared parameters (the folded path must be a pure compute-
layout change — same params, same outputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mod_extraction_tpu.ops.conv import (
    conv2d_freq_folded,
    conv2d_pair_rows,
    conv2d_same,
    fold_freq,
    foldable,
    unfold_freq,
)


@pytest.mark.parametrize("t_dil", [1, 2, 8])
def test_folded_equals_lax(rng, t_dil):
    x = jnp.asarray(rng.standard_normal((3, 16, 50, 8)).astype(np.float32))
    w = jnp.asarray(
        (0.1 * rng.standard_normal((5, 13, 8, 12))).astype(np.float32)
    )
    a = conv2d_same(x, w, 1, t_dil)
    b = conv2d_freq_folded(x, w, 1, t_dil)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fold_unfold_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 4)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(unfold_freq(fold_freq(x))), np.asarray(x)
    )


def test_foldable_guards():
    assert foldable((5, 13, 64, 64), bin_dil=1, f=256)
    assert not foldable((5, 13, 64, 64), bin_dil=2, f=256)  # bin dilation
    assert not foldable((3, 13, 64, 64), bin_dil=1, f=256)  # kernel != 5
    assert not foldable((5, 13, 64, 64), bin_dil=1, f=85)  # odd freq dim


@pytest.mark.parametrize("t_dil", [1, 2, 8])
def test_pair_rows_equals_lax(rng, t_dil):
    x = jnp.asarray(rng.standard_normal((3, 16, 50, 8)).astype(np.float32))
    w = jnp.asarray(
        (0.1 * rng.standard_normal((5, 13, 8, 12))).astype(np.float32)
    )
    a = conv2d_same(x, w, 1, t_dil)
    b = conv2d_pair_rows(x, w, 1, t_dil)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize(
    "fwd,dgrad,wgrad",
    [("pair", "pair", "xla"), ("pair", "lax", "xla"), ("lax", "pair", "xla")],
)
def test_custom_conv_grads_match_lax(rng, fwd, dgrad, wgrad):
    """make_conv2d_custom with row-pair fwd/dgrad: same output AND same
    (dx, dw) as jax.grad of the plain conv."""
    from mod_extraction_tpu.ops.pallas_conv import make_conv2d_custom

    t_dil = 2
    x = jnp.asarray(rng.standard_normal((2, 8, 40, 8)).astype(np.float32))
    w = jnp.asarray(
        (0.1 * rng.standard_normal((5, 13, 8, 12))).astype(np.float32)
    )
    g = jnp.asarray(rng.standard_normal((2, 8, 40, 12)).astype(np.float32))
    conv = make_conv2d_custom(t_dil, fwd_impl=fwd, dgrad_impl=dgrad,
                              wgrad_impl=wgrad)

    np.testing.assert_allclose(
        np.asarray(conv(x, w)),
        np.asarray(conv2d_same(x, w, 1, t_dil, preferred=None)),
        atol=2e-5,
    )

    def loss(fn, x, w):
        return jnp.sum(fn(x, w) * g)

    dx, dw = jax.grad(lambda x, w: loss(conv, x, w), argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(
        lambda x, w: loss(
            lambda a, b: conv2d_same(a, b, 1, t_dil, preferred=None), x, w
        ),
        argnums=(0, 1),
    )(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r), atol=2e-3)


def test_spectral2dcnn_conv_impl_equivalence(rng):
    """Same params, conv_impl='lax' vs 'freq_folded' -> same outputs.
    Uses pool (2,1) so every trunk layer keeps an even freq dim (the
    paper config); f32 so the comparison is tight."""
    from mod_extraction_tpu.models import Spectral2DCNN

    kw = dict(
        in_ch=2, n_samples=8192, sr=44100, n_fft=512, hop_len=256,
        n_mels=32, kernel_size=(5, 13), out_channels=(8, 8, 8),
        temp_dilations=(1, 2, 4), pool_size=(2, 1),
    )
    m_lax = Spectral2DCNN(conv_impl="lax", **kw)
    m_fold = Spectral2DCNN(conv_impl="freq_folded", **kw)
    x = jnp.asarray(
        (0.3 * rng.standard_normal((2, 2, 8192))).astype(np.float32)
    )
    params = m_lax.init(jax.random.PRNGKey(0), x)
    y_lax, lat_lax = m_lax.apply(params, x)
    y_fold, lat_fold = m_fold.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_lax), np.asarray(y_fold), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(lat_lax), np.asarray(lat_fold), atol=2e-5
    )
    m_pair = Spectral2DCNN(conv_impl="pair", **kw)
    y_pair, lat_pair = m_pair.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_lax), np.asarray(y_pair), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(lat_lax), np.asarray(lat_pair), atol=2e-5
    )
    # and the param tree is checkpoint-shaped either way (Conv_i names)
    assert "Conv_0" in params["params"] and "Conv_2" in params["params"]
    assert set(params["params"]["Conv_0"]) == {"kernel", "bias"}


def test_grad_barrier_bias_vjp_bit_exact(rng):
    """grad_barrier (custom VJP owning the bias, optimization_barrier on
    the cotangent, f32 dbias) must reproduce the autodiff path's loss
    and every param gradient bit-for-bit in f32 — the barrier only pins
    XLA scheduling, never the math (ops/pallas_conv.py
    make_conv2d_custom(with_bias=True, barrier=True))."""
    from mod_extraction_tpu.models import Spectral2DCNN

    kw = dict(
        in_ch=2, n_samples=8192, sr=44100, n_fft=512, hop_len=256,
        n_mels=32, kernel_size=(5, 13), out_channels=(8, 8, 8),
        temp_dilations=(1, 2, 4), pool_size=(2, 1),
    )
    x = jnp.asarray(
        (0.3 * rng.standard_normal((2, 2, 8192))).astype(np.float32)
    )
    m0 = Spectral2DCNN(**kw)
    params = m0.init(jax.random.PRNGKey(0), x)

    def loss(m, p):
        y, _ = m.apply(p, x)
        return jnp.sum(y**2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    for mode in (True, "l0"):
        m1 = Spectral2DCNN(grad_barrier=mode, **kw)
        l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
        assert float(l0) == float(l1), mode
        for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1),
        ):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{mode} {jax.tree_util.keystr(k)}",
            )


@pytest.mark.parametrize("wgrad", ["xla", "pallas"])
def test_custom_conv_with_bias_grads(rng, wgrad):
    """make_conv2d_custom(with_bias=True): (x, w, b) -> conv + b with
    dx/dw/db matching jax.grad of the plain conv (+ bias), including the
    Pallas tap-concat wgrad in interpret mode."""
    from mod_extraction_tpu.ops.pallas_conv import make_conv2d_custom

    t_dil = 2
    # pre-round x/g to bf16 so the tap-concat kernel's internal bf16
    # cast is lossless and the comparison against the f32 reference is
    # tight (the gate's "bf16-exact inputs" trick)
    def bf16_exact(a):
        return jnp.asarray(a.astype(np.float32)).astype(jnp.bfloat16).astype(
            jnp.float32
        )

    x = bf16_exact(rng.standard_normal((2, 8, 40, 8)))
    w = jnp.asarray(
        (0.1 * rng.standard_normal((5, 13, 8, 16))).astype(np.float32)
    )
    b = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))
    g = bf16_exact(rng.standard_normal((2, 8, 40, 16)))
    conv = make_conv2d_custom(
        t_dil, fwd_impl="lax", dgrad_impl="lax", wgrad_impl=wgrad,
        interpret=True, with_bias=True, barrier=True,
    )

    def ref(x, w, b):
        return conv2d_same(x, w, 1, t_dil, preferred=None) + b

    np.testing.assert_allclose(
        np.asarray(conv(x, w, b)), np.asarray(ref(x, w, b)), atol=2e-5
    )
    dx, dw, db = jax.grad(
        lambda *a: jnp.sum(conv(*a) * g), argnums=(0, 1, 2)
    )(x, w, b)
    dx_r, dw_r, db_r = jax.grad(
        lambda *a: jnp.sum(ref(*a) * g), argnums=(0, 1, 2)
    )(x, w, b)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r), atol=2e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_r), atol=2e-4)
