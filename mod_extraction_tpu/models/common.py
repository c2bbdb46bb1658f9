"""Shared NN building blocks (torch-semantics parity helpers).

The reference models are built from torch primitives whose exact numerics
matter for checkpoint parity: per-channel PReLU, affine-free LayerNorm
over fixed trailing dims, 'same'-padded dilated convs, floor-mode max
pooling.  These helpers reproduce those semantics in JAX with
channels-LAST internal layout (TPU-friendly)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel PReLU (torch `nn.PReLU(num_parameters=C)`), channel-last."""

    num_parameters: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha",
            lambda k, s: jnp.full(s, self.init, jnp.float32),
            (self.num_parameters,),
        )
        return jnp.where(x >= 0, x, a * x)


def layer_norm_no_affine(x: jnp.ndarray, axes: Sequence[int], eps: float = 1e-5):
    """torch `nn.LayerNorm(normalized_shape, elementwise_affine=False)`.

    The reference normalizes each (batch, channel) slice over the full
    (bins, frames) plane (`models.py:186`, `tcn.py:152`)."""
    mean = jnp.mean(x, axis=tuple(axes), keepdims=True)
    var = jnp.var(x, axis=tuple(axes), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def same_pads(kernel: int, dilation: int) -> tuple[int, int]:
    """torch Conv 'same' padding (symmetric; left gets the smaller half)."""
    eff = (kernel - 1) * dilation
    lo = eff // 2
    return (lo, eff - lo)


def max_pool_floor(x: jnp.ndarray, window: tuple[int, int]) -> jnp.ndarray:
    """torch `nn.MaxPool2d(window)` (stride=window, floor mode), on
    (B, H, W, C) channel-last input.

    Implemented with `lax.reduce_window` (VALID padding after cropping to
    window multiples): its gradient is a select-and-scatter, unlike a
    reshape+max whose backward materializes an eq-broadcast the size of
    batch x activations x window (HBM OOM at large batch)."""
    import jax

    h, w = window
    b, hh, ww, c = x.shape
    hh2, ww2 = (hh // h) * h, (ww // w) * w
    x = x[:, :hh2, :ww2, :]
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, h, w, 1),
        window_strides=(1, h, w, 1),
        padding="VALID",
    )
