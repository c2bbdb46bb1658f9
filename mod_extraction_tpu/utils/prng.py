"""PRNG sampling helpers.

TPU-native replacements for the reference's global-RNG draws
(`mod_extraction/util.py:32-62`): every sampler takes an explicit
`jax.random` key so data generation is reproducible, jittable, and
shardable (derive per-example keys with ``jax.random.fold_in``).

Host-side (numpy) twins live in :mod:`mod_extraction_tpu.data.sampling`
for the input pipeline.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def sample_uniform(key: jax.Array, low, high, shape=()) -> jnp.ndarray:
    """U[low, high). low/high may be scalars or arrays broadcastable to shape."""
    u = jax.random.uniform(key, shape, dtype=jnp.float32)
    return u * (jnp.asarray(high) - jnp.asarray(low)) + jnp.asarray(low)


def sample_log_uniform(key: jax.Array, low, high, shape=()) -> jnp.ndarray:
    """Log-uniform over [low, high) (reciprocal distribution).

    Matches `scipy.stats.loguniform.rvs` used at `util.py:52-62`:
    exp(U[log low, log high)).  When low == high returns the constant.
    """
    low = jnp.asarray(low, dtype=jnp.float32)
    high = jnp.asarray(high, dtype=jnp.float32)
    u = jax.random.uniform(key, shape, dtype=jnp.float32)
    out = jnp.exp(u * (jnp.log(high) - jnp.log(low)) + jnp.log(low))
    return jnp.where(low == high, jnp.broadcast_to(low, out.shape), out)


def sample_randint(key: jax.Array, low: int, high, shape=()) -> jnp.ndarray:
    """Integer in [low, high) like the reference's `randint` (`util.py:38`)."""
    return jax.random.randint(key, shape, low, high, dtype=jnp.int32)


def sample_choice(key: jax.Array, n_items: int, shape=()) -> jnp.ndarray:
    """Uniform index in [0, n_items) — index-space version of `choice`."""
    return jax.random.randint(key, shape, 0, n_items, dtype=jnp.int32)


def split_tree(key: jax.Array, names: Sequence[str]) -> dict:
    """Split a key into a dict of named subkeys (stable by position)."""
    keys = jax.random.split(key, len(names))
    return {name: k for name, k in zip(names, keys)}
