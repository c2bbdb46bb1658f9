"""Linear resampling along the last dimension.

TPU-native equivalent of the reference's `linear_interpolate_last_dim`
(`mod_extraction/util.py:15-29`, a thin wrapper over
`torch.nn.functional.interpolate(mode="linear")`).

Implemented as a gather + lerp so it vectorizes over arbitrary leading
dims and stays fully jittable (static output length).  Semantics match
torch's `F.interpolate`:

* ``align_corners=True``:  src = i * (n_in - 1) / (n_out - 1)
* ``align_corners=False``: src = (i + 0.5) * n_in / n_out - 0.5, clamped to
  [0, n_in - 1]

Both paths clamp gather indices, so the result is exact at the endpoints.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def linear_interpolate_last_dim(
    x: jnp.ndarray, n: int, align_corners: bool = True
) -> jnp.ndarray:
    """Resample ``x`` to length ``n`` along the last dim (any leading dims).

    Output length is static, so gather indices and lerp fractions are
    computed host-side in float64 (mirroring torch's double-precision
    index math) and baked into the graph as constants.
    """
    n_in = x.shape[-1]
    if n_in == n:
        return x
    i = np.arange(n, dtype=np.float64)
    if align_corners:
        src = np.zeros(1) if n == 1 else i * (n_in - 1) / (n - 1)
    else:
        src = np.clip((i + 0.5) * (n_in / n) - 0.5, 0.0, n_in - 1)
    lo = np.clip(np.floor(src).astype(np.int32), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    frac = jnp.asarray((src - lo).astype(np.float32), dtype=x.dtype)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=-1)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=-1)
    return x_lo + (x_hi - x_lo) * frac


def linear_resample(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Alias for align_corners=True resampling (the reference's default)."""
    return linear_interpolate_last_dim(x, n, align_corners=True)
