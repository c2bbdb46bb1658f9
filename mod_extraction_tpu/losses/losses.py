"""Loss zoo (reference `mod_extraction/losses.py`).

All losses are pure functions `(y_hat, y, weights=None) -> scalar`, where
`weights` is an optional (B,) per-example mask/weight.  The weighting is
how the TBPTT task drops invalid-LFO examples under jit (the reference
shrinks the batch instead, `lightning.py:325-335` — impossible with
static shapes, so we weight the mean).

`mr_stft_loss` replaces auraloss `MultiResolutionSTFTLoss` (used at
`losses.py:156`) with its default resolutions: fft (1024, 2048, 512),
hop (120, 240, 50), win (600, 1200, 240), spectral-convergence + log-mag
terms, torch.stft center=False semantics.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mod_extraction_tpu.ops.stft import hann_window, mel_spectrogram


def _wmean(per_example: jnp.ndarray, weights: Optional[jnp.ndarray]):
    """Mean over examples; `per_example` has the batch as axis 0 (any extra
    axes are averaged uniformly first)."""
    if per_example.ndim > 1:
        per_example = jnp.mean(
            per_example.reshape(per_example.shape[0], -1), axis=-1
        )
    if weights is None:
        return jnp.mean(per_example)
    w = weights.astype(per_example.dtype)
    return jnp.sum(per_example * w) / jnp.maximum(jnp.sum(w), 1e-8)


def l1_loss(y_hat, y, weights=None):
    return _wmean(jnp.abs(y_hat - y), weights)


def mse_loss(y_hat, y, weights=None):
    return _wmean((y_hat - y) ** 2, weights)


def esr_loss(y_hat, y, weights=None, eps: float = 1e-8):
    """Error-to-signal ratio (`losses.py:14-39`): per (B, C) the ratio of
    error energy to target energy over the last dim, then mean."""
    num = jnp.sum((y - y_hat) ** 2, axis=-1)
    denom = jnp.sum(y**2, axis=-1) + eps
    return _wmean(num / denom, weights)


def dc_loss(y_hat, y, weights=None, eps: float = 1e-8):
    """DC offset loss (`losses.py:42-67`)."""
    num = jnp.mean(y - y_hat, axis=-1) ** 2
    denom = jnp.mean(y**2, axis=-1) + eps
    return _wmean(num / denom, weights)


def _central_diff(x):
    return (x[..., 2:] - x[..., :-2]) / 2.0


def first_derivative_l1_loss(y_hat, y, weights=None):
    """L1 of central differences (`losses.py:70-84`)."""
    return _wmean(jnp.abs(_central_diff(y_hat) - _central_diff(y)), weights)


def second_derivative_l1_loss(y_hat, y, weights=None):
    """L1 of twice-applied central differences (`losses.py:87-102`)."""
    d2h = _central_diff(_central_diff(y_hat))
    d2 = _central_diff(_central_diff(y))
    return _wmean(jnp.abs(d2h - d2), weights)


def log_mel_l1_loss(
    y_hat, y, weights=None, sr=44100, n_fft=1024, hop=256, n_mels=256, eps=1e-7
):
    """L1 between log mel spectrograms (`losses.py:105-130`)."""
    sh = jnp.log(jnp.maximum(mel_spectrogram(y_hat, int(sr), n_fft, hop, n_mels), eps))
    st = jnp.log(jnp.maximum(mel_spectrogram(y, int(sr), n_fft, hop, n_mels), eps))
    return _wmean(jnp.abs(sh - st), weights)


def _stft_mag(x, n_fft: int, hop: int, win_length: int):
    """torch.stft(center=False) magnitude with a centered hann(win) padded
    to n_fft, matching auraloss's STFT."""
    win = np.zeros(n_fft, np.float32)
    off = (n_fft - win_length) // 2
    win[off : off + win_length] = hann_window(win_length)
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = x[..., idx] * jnp.asarray(win)
    spec = jnp.fft.rfft(frames, axis=-1)
    mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(jnp.maximum(mag2, 1e-8))


def mr_stft_loss(
    y_hat,
    y,
    weights=None,
    fft_sizes=(1024, 2048, 512),
    hop_sizes=(120, 240, 50),
    win_lengths=(600, 1200, 240),
):
    """Multi-resolution STFT loss: mean over resolutions of
    (spectral convergence + log-magnitude L1)."""
    yh = y_hat.reshape(-1, y_hat.shape[-1])
    yt = y.reshape(-1, y.shape[-1])
    total = 0.0
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        mh = _stft_mag(yh, n_fft, hop, win)
        mt = _stft_mag(yt, n_fft, hop, win)
        sc = jnp.linalg.norm(mt - mh) / jnp.maximum(jnp.linalg.norm(mt), 1e-8)
        log_mag = jnp.mean(jnp.abs(jnp.log(mt) - jnp.log(mh)))
        total = total + sc + log_mag
    return total / len(fft_sizes)


LossFn = Callable[..., jnp.ndarray]

_LOSS_REGISTRY: Dict[str, LossFn] = {
    "l1": l1_loss,
    "fdl1": first_derivative_l1_loss,
    "sdl1": second_derivative_l1_loss,
    "mse": mse_loss,
    "esr": esr_loss,
    "dc": dc_loss,
    "mrstft": mr_stft_loss,
    "log_mel_l1": log_mel_l1_loss,
}


def get_loss_func_by_name(name: str) -> LossFn:
    """Registry lookup (`losses.py:142-160`)."""
    if name not in _LOSS_REGISTRY:
        raise KeyError(f"Unknown loss: {name}")
    return _LOSS_REGISTRY[name]


class WeightedLossDict:
    """Weighted multi-loss aggregator (reference `BaseLightingModule`,
    `lightning.py:23-62`): every named loss is computed and returned as a
    metric (including zero-weighted ones); the total sums the weighted
    positive-weight terms."""

    def __init__(self, loss_dict: Optional[Dict[str, float]] = None):
        if loss_dict is None:
            loss_dict = {"l1": 1.0, "mse": 0.0}
        self.loss_dict = dict(loss_dict)
        self.funcs = {name: get_loss_func_by_name(name) for name in loss_dict}

    def __call__(
        self, y_hat, y, weights=None
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        metrics = {}
        total = 0.0
        for name, weight in self.loss_dict.items():
            val = self.funcs[name](y_hat, y, weights)
            metrics[name] = val
            if weight > 0:
                total = total + weight * val
        total = jnp.asarray(total)
        metrics["loss"] = total
        return total, metrics
