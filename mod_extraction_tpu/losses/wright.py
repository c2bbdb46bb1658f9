"""Wright (CoreAudioML) reference losses — numerical-parity companions to
the main loss zoo, mirroring the reference's vendored copies
(`mod_extraction/wright_code.py:15-73`; upstream Alec-Wright/CoreAudioML).

Like the reference, these are parity references only and are NOT in the
loss registry: `wright_esr_loss`/`wright_dc_loss` use eps=0 (matching
auraloss) and global means, whereas the registry's `esr`/`dc` reduce
per-example and support masking/weights.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def wright_esr_loss(output: jnp.ndarray, target: jnp.ndarray, eps: float = 0.0):
    """Error-to-signal ratio with global means (`wright_code.py:15-28`)."""
    loss = jnp.mean(jnp.square(target - output))
    energy = jnp.mean(jnp.square(target)) + eps
    return loss / energy


def wright_dc_loss(output: jnp.ndarray, target: jnp.ndarray, eps: float = 0.0):
    """DC offset loss: squared difference of the axis-0 means, normalized
    by target energy (`wright_code.py:30-41`)."""
    diff = jnp.mean(target, axis=0) - jnp.mean(output, axis=0)
    loss = jnp.mean(jnp.square(diff))
    energy = jnp.mean(jnp.square(target)) + eps
    return loss / energy


def wright_pre_emph(
    output: jnp.ndarray,
    target: jnp.ndarray,
    filter_cfs: Sequence[float],
    low_pass: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FIR pre-emphasis applied to (T, B, 1) signals
    (`wright_code.py:45-73`); optional extra [0.85, 1] low-pass tap.

    Inputs are zero-padded on the time axis so outputs keep length T.
    """
    cfs = jnp.asarray(filter_cfs, jnp.float32)
    z_pad = cfs.shape[0] - 1

    def fir(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
        # x: (T, B, 1); correlate along time with the 2-tap kernel the way
        # torch Conv1d does (no flip)
        t, b, _ = x.shape
        xp = jnp.concatenate([jnp.zeros((taps.shape[0] - 1, b, 1), x.dtype), x])
        acc = jnp.zeros((t, b, 1), x.dtype)
        for k in range(taps.shape[0]):
            acc = acc + taps[k] * xp[k : k + t]
        return acc

    del z_pad  # padding handled inside fir per-filter
    out, tgt = fir(output, cfs), fir(target, cfs)
    if low_pass:
        lp = jnp.asarray([0.85, 1.0], jnp.float32)
        out, tgt = fir(out, lp), fir(tgt, lp)
    return out, tgt
