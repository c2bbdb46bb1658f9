"""Sample-rate conversion — the torchaudio `Resample` equivalent
(the reference resamples datasets with it in `scripts/split_datasets.py`
and `scripts/resample.py`).

Windowed-sinc polyphase resampler: rates are reduced by their gcd to
(orig_g, new_g); each of the new_g output phases has a fixed FIR taken
from a Hann-windowed sinc with cutoff at the lower Nyquist (rolloff
0.99), and the filtering is a strided dot per phase.  Host numpy is the
primary consumer (dataset prep); the kernel bank is reusable from jnp
for an on-device variant if needed.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

LOWPASS_FILTER_WIDTH = 6  # sinc lobes on each side
ROLLOFF = 0.99


@lru_cache(maxsize=32)
def _kernel_bank(orig_g: int, new_g: int) -> tuple[np.ndarray, np.ndarray, int]:
    """FIR bank for reduced rates (orig_g, new_g).

    Returns (kernels (new_g, 2W+1), n0 offsets (new_g,), W).
    Output j (phase p = j % new_g, block m = j // new_g) is
    sum_k kernels[p, k] * x[n0[p] + m*orig_g + k - W].
    """
    # normalized cutoff in cycles per orig sample
    fc = ROLLOFF * min(orig_g, new_g) / orig_g / 2.0
    w = int(math.ceil(LOWPASS_FILTER_WIDTH / (2.0 * fc)))
    k = np.arange(-w, w + 1, dtype=np.float64)
    kernels = np.empty((new_g, 2 * w + 1), np.float64)
    n0 = np.empty((new_g,), np.int64)
    for p in range(new_g):
        tau = p * orig_g / new_g
        n0[p] = math.floor(tau)
        frac = tau - n0[p]
        t = k - frac
        x = 2.0 * math.pi * fc * t
        sinc = np.where(np.abs(x) < 1e-12, 1.0, np.sin(x) / np.where(x == 0, 1.0, x))
        # Hann window over the filter support
        win = np.cos(np.clip(t / w, -1.0, 1.0) * math.pi / 2.0) ** 2
        kernels[p] = 2.0 * fc * sinc * win
    return kernels.astype(np.float32), n0, w


def resample(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Resample along the last axis. x: (..., T) -> (..., ceil(T*new/orig))."""
    orig_freq, new_freq = int(orig_freq), int(new_freq)
    x = np.asarray(x, np.float32)
    if orig_freq == new_freq:
        return x
    g = math.gcd(orig_freq, new_freq)
    orig_g, new_g = orig_freq // g, new_freq // g
    kernels, n0, w = _kernel_bank(orig_g, new_g)
    klen = 2 * w + 1

    lead, t = x.shape[:-1], x.shape[-1]
    flat = x.reshape(-1, t)
    n_out = int(math.ceil(t * new_g / orig_g))
    n_blocks = (n_out + new_g - 1) // new_g  # output blocks of size new_g
    # pad so every window gather is in-bounds
    pad_right = w + (n_blocks - 1) * orig_g + int(n0.max()) + klen - (t + w)
    padded = np.pad(flat, ((0, 0), (w, max(pad_right, 0))))
    windows = np.lib.stride_tricks.sliding_window_view(padded, klen, axis=1)

    out = np.zeros((flat.shape[0], n_blocks * new_g), np.float32)
    block_starts = np.arange(n_blocks, dtype=np.int64) * orig_g
    for p in range(new_g):
        starts = block_starts + n0[p]  # window start = n0 - W + W(pad) = n0
        out[:, p::new_g] = windows[:, starts, :] @ kernels[p]
    return out[:, :n_out].reshape(*lead, n_out)
