"""Shared NN building blocks (torch-semantics parity helpers).

The reference models are built from torch primitives whose exact numerics
matter for checkpoint parity: per-channel PReLU, affine-free LayerNorm
over fixed trailing dims, 'same'-padded dilated convs, floor-mode max
pooling.  These helpers reproduce those semantics in JAX with
channels-LAST internal layout (TPU-friendly)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel PReLU (torch `nn.PReLU(num_parameters=C)`), channel-last.

    `keep_dtype=True` computes `alpha * x` in x's dtype instead of letting
    the fp32 alpha promote the product — with a bfloat16 trunk this keeps
    the activation stream (and every backward re-read of it) in bf16,
    halving the HBM traffic of the elementwise tail."""

    num_parameters: int
    init: float = 0.25
    keep_dtype: bool = False

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha",
            lambda k, s: jnp.full(s, self.init, jnp.float32),
            (self.num_parameters,),
        )
        if self.keep_dtype:
            a = a.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


def layer_norm_no_affine(
    x: jnp.ndarray,
    axes: Sequence[int],
    eps: float = 1e-5,
    stat_dtype: jnp.dtype | None = None,
):
    """torch `nn.LayerNorm(normalized_shape, elementwise_affine=False)`.

    The reference normalizes each (batch, channel) slice over the full
    (bins, frames) plane (`models.py:186`, `tcn.py:152`).

    With `stat_dtype` set (e.g. float32 for a bfloat16 trunk), the
    statistics and the normalization arithmetic run in that dtype but the
    RESULT is cast back to x.dtype — the materialized tensor stays narrow
    while the reductions keep full precision."""
    if stat_dtype is None:
        mean = jnp.mean(x, axis=tuple(axes), keepdims=True)
        var = jnp.var(x, axis=tuple(axes), keepdims=True)
        return (x - mean) / jnp.sqrt(var + eps)
    xs = x.astype(stat_dtype)
    mean = jnp.mean(xs, axis=tuple(axes), keepdims=True)
    var = jnp.var(xs, axis=tuple(axes), keepdims=True)
    return ((xs - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def same_pads(kernel: int, dilation: int) -> tuple[int, int]:
    """torch Conv 'same' padding (symmetric; left gets the smaller half)."""
    eff = (kernel - 1) * dilation
    lo = eff // 2
    return (lo, eff - lo)


def _reduce_window_max(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    import jax

    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, h, w, 1),
        window_strides=(1, h, w, 1),
        padding="VALID",
    )


def _make_pool_vjp():
    import functools

    import jax

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
    def pool(x, h, w):
        return _reduce_window_max(x, h, w)

    def fwd(x, h, w):
        y = pool(x, h, w)
        return y, (x, y)

    def bwd(h, w, res, g):
        # eq-mask backward: route the cotangent to EVERY window element
        # equal to the max.  An elementwise broadcast-compare the size of
        # the (already live) input — XLA fuses it, unlike the default
        # reduce_window transpose (SelectAndScatter, a TPU slow path).
        # Deviates from torch (first-max-wins) only on exact ties inside
        # a window, where every tied element receives the cotangent.
        x, y = res
        up = jnp.repeat(jnp.repeat(y, h, axis=1), w, axis=2)
        gu = jnp.repeat(jnp.repeat(g, h, axis=1), w, axis=2)
        return (jnp.where(x == up, gu, jnp.zeros_like(gu)).astype(x.dtype),)

    pool.defvjp(fwd, bwd)
    return pool


_POOL_EQMASK = _make_pool_vjp()


def max_pool_floor(
    x: jnp.ndarray, window: tuple[int, int], bwd_impl: str = "eq_mask"
) -> jnp.ndarray:
    """torch `nn.MaxPool2d(window)` (stride=window, floor mode), on
    (B, H, W, C) channel-last input.

    Forward is `lax.reduce_window` either way.  `bwd_impl`:

    * "eq_mask" (default) — custom VJP whose backward is a fused
      elementwise broadcast-compare against the (already live) input.
    * "select_scatter" — the default XLA transpose (SelectAndScatter),
      exact first-max-wins semantics but a known TPU slow path over
      the trunk's up-to-1.4 GB activations.
    """
    h, w = window
    b, hh, ww, c = x.shape
    hh2, ww2 = (hh // h) * h, (ww // w) * w
    x = x[:, :hh2, :ww2, :]
    if bwd_impl == "eq_mask":
        return _POOL_EQMASK(x, h, w)
    return _reduce_window_max(x, h, w)
