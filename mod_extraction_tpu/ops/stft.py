"""Spectrogram / Mel frontend.

TPU-native replacement for the torchaudio transforms the reference relies
on (`mod_extraction/models.py:99,170-175`, `losses.py:114-119`):
`Spectrogram(n_fft, hop)` and `MelSpectrogram(sr, n_fft, hop, n_mels,
center=True)` with torchaudio default semantics:

* hann window, periodic (`torch.hann_window(n_fft)`)
* center=True with reflect padding of n_fft//2 on both sides
* power spectrogram (|X|^2), no normalization
* HTK mel scale (mel = 2595 log10(1 + f/700)), f_min=0, f_max=sr/2,
  triangular filters, no norm ("slaney" area-norm NOT applied)

Framing is a strided gather; the mel projection is a single
(n_freqs, n_mels) matmul that XLA maps onto the MXU.  Frame count =
1 + n_samples // hop, matching torch.stft with center=True.

The DFT itself has two implementations (`impl=`):

* "rfft" — `jnp.fft.rfft`.  XLA's TPU FFT lowering is a slow path:
  18.6 ms for the (128, 2, 88200) training frontend on v5e.
* "dft" — an explicit real-DFT as two (n_fft, n_freqs) matmuls in
  float32 (HIGHEST precision, so it matches rfft to float tolerance).
  The MXU eats this: 5.6 ms for the same shape, and the basis is only
  (n_fft, n_fft//2+1) resident.
* "dft_bf16" — the same two matmuls with bfloat16 inputs and float32
  accumulation (~4x MXU rate).  The windowed frames round to 8-bit
  mantissa, so the power spectrogram carries ~0.5% relative noise —
  below the log-mel + LayerNorm + SpecAugment noise floor of the
  training frontend, but NOT rfft-exact; keep eval paths on "dft".
* "auto" (default) — "dft" on TPU, "rfft" elsewhere (host CPU FFT
  beats a CPU matmul-DFT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))).astype(
        np.float32
    )


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, f_min: float = 0.0, f_max: float | None = None
) -> np.ndarray:
    """Triangular mel filterbank, torchaudio `melscale_fbanks` semantics
    (HTK scale, norm=None).  Returns (n_freqs, n_mels) float32."""
    if f_max is None:
        f_max = sr / 2.0
    n_freqs = n_fft // 2 + 1
    # torchaudio: all_freqs = linspace(0, sample_rate // 2, n_freqs)
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int) -> tuple:
    """Real-DFT basis: (n_fft, n_freqs) cos / -sin float32 matrices."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _power_frames(frames: jnp.ndarray, n_fft: int, impl: str) -> jnp.ndarray:
    """|DFT(frames)|^2 over the last axis: (..., n_fft) -> (..., n_freqs)."""
    if impl == "auto":
        impl = "dft" if jax.default_backend() == "tpu" else "rfft"
    if impl == "dft":
        cos_b, sin_b = (jnp.asarray(b) for b in _dft_basis(n_fft))
        # HIGHEST: true-f32 MXU passes — matches rfft to float tolerance
        re = jnp.matmul(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
        return re * re + im * im
    if impl == "dft_bf16":
        cos_b, sin_b = (
            jnp.asarray(b, jnp.bfloat16) for b in _dft_basis(n_fft)
        )
        fr = frames.astype(jnp.bfloat16)
        re = jnp.matmul(fr, cos_b, preferred_element_type=jnp.float32)
        im = jnp.matmul(fr, sin_b, preferred_element_type=jnp.float32)
        return re * re + im * im
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def _frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-padded (reflect) framing: (..., T) -> (..., n_frames, n_fft)."""
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = (x.shape[-1] - n_fft) // hop + 1
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def spectrogram(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    power: float = 2.0,
    impl: str = "auto",
) -> jnp.ndarray:
    """Power spectrogram, shape (..., n_freqs, n_frames).

    Matches `torchaudio.transforms.Spectrogram(n_fft, hop_length=hop,
    normalized=False)` (center=True, reflect, hann).
    """
    frames = _frame(x.astype(jnp.float32), n_fft, hop)
    win = jnp.asarray(hann_window(n_fft))
    mag2 = _power_frames(frames * win, n_fft, impl)
    if power == 2.0:
        out = mag2
    elif power == 1.0:
        out = jnp.sqrt(jnp.maximum(mag2, 1e-30))
    else:
        out = jnp.power(jnp.maximum(mag2, 1e-30), power / 2.0)
    return jnp.swapaxes(out, -1, -2)  # (..., n_freqs, n_frames)


def mel_spectrogram(
    x: jnp.ndarray,
    sr: int = 44100,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 256,
    impl: str = "auto",
) -> jnp.ndarray:
    """Mel power spectrogram (..., n_mels, n_frames), torchaudio parity."""
    frames = _frame(x.astype(jnp.float32), n_fft, hop)
    win = jnp.asarray(hann_window(n_fft))
    mag2 = _power_frames(frames * win, n_fft, impl)  # (..., n_frames, n_freqs)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))  # (n_freqs, n_mels)
    mel = mag2 @ fb  # MXU matmul over the frequency axis
    return jnp.swapaxes(mel, -1, -2)


def log_mel_spectrogram(
    x, sr=44100, n_fft=1024, hop=256, n_mels=256, eps=1e-7, impl="auto"
):
    """log(clip(mel, eps)) — the model frontend (`models.py:207-208`)."""
    return jnp.log(
        jnp.maximum(mel_spectrogram(x, sr, n_fft, hop, n_mels, impl), eps)
    )


def spec_augment(
    key: jax.Array,
    spec: jnp.ndarray,
    freq_mask_param: int,
    time_mask_param: int,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """SpecAugment frequency + time masking.

    Matches torchaudio `FrequencyMasking`/`TimeMasking` defaults
    (`models.py:180-181,201-205`): one mask per call, the SAME mask across
    the batch (iid_masks=False), width ~ U[0, param), start ~ U[0, size -
    width).  `spec` is (..., n_mels, n_frames); masking applied to the raw
    (pre-log) power values with `mask_value`.
    """
    kf1, kf2, kt1, kt2 = jax.random.split(key, 4)
    n_mels, n_frames = spec.shape[-2], spec.shape[-1]
    out = spec
    if freq_mask_param > 0:
        width = jax.random.uniform(kf1) * freq_mask_param
        start = jax.random.uniform(kf2) * (n_mels - width)
        f = jnp.arange(n_mels, dtype=jnp.float32)
        mask = (f >= start) & (f < start + width)
        out = jnp.where(mask[:, None], mask_value, out)
    if time_mask_param > 0:
        width = jax.random.uniform(kt1) * time_mask_param
        start = jax.random.uniform(kt2) * (n_frames - width)
        t = jnp.arange(n_frames, dtype=jnp.float32)
        mask = (t >= start) & (t < start + width)
        out = jnp.where(mask[None, :], mask_value, out)
    return out
