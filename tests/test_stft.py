"""Mel/STFT frontend tests against independent numpy oracles."""

import numpy as np
import pytest

from mod_extraction_tpu.ops.stft import (
    hann_window,
    mel_filterbank,
    mel_spectrogram,
    spec_augment,
    spectrogram,
)


def _np_power_spec(x, n_fft, hop):
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = (len(xp) - n_fft) // hop + 1
    win = hann_window(n_fft).astype(np.float64)
    frames = np.stack([xp[i * hop : i * hop + n_fft] for i in range(n_frames)])
    spec = np.fft.rfft(frames * win, axis=-1)
    return (np.abs(spec) ** 2).T  # (n_freqs, n_frames)


def test_spectrogram_matches_numpy(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    ours = np.asarray(spectrogram(x[None], n_fft=512, hop=128))[0]
    ref = _np_power_spec(x.astype(np.float64), 512, 128)
    assert ours.shape == ref.shape == (257, 4096 // 128 + 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_frame_count_88200():
    x = np.zeros((1, 88200), np.float32)
    s = spectrogram(x, n_fft=1024, hop=256)
    assert s.shape == (1, 513, 345 + 1 - 1)  # 88200//256 + 1 = 345... check
    assert s.shape[-1] == 88200 // 256 + 1


def test_mel_filterbank_properties():
    fb = mel_filterbank(44100, 1024, 256)
    assert fb.shape == (513, 256)
    assert fb.min() >= 0.0
    # With 256 mel bands over 513 FFT bins (HTK scale), the lowest mel
    # filters are narrower than one FFT bin, so ~20 have empty support —
    # torchaudio's melscale_fbanks produces the same (and warns).
    assert (fb.sum(axis=0) > 0).sum() >= 230
    # triangle peaks are at most 1 (no normalization)
    assert fb.max() <= 1.0 + 1e-6
    # HTK scale: mel(1000 Hz) ~ 999.99
    from mod_extraction_tpu.ops.stft import hz_to_mel_htk, mel_to_hz_htk

    assert hz_to_mel_htk(1000.0) == pytest.approx(999.9855, abs=1e-2)
    assert mel_to_hz_htk(hz_to_mel_htk(440.0)) == pytest.approx(440.0, rel=1e-9)


def test_mel_spectrogram_is_matmul_of_spec(rng):
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    spec = np.asarray(spectrogram(x, n_fft=512, hop=128))
    fb = mel_filterbank(16000, 512, 64)
    expect = np.einsum("bft,fm->bmt", spec, fb)
    ours = np.asarray(mel_spectrogram(x, sr=16000, n_fft=512, hop=128, n_mels=64))
    np.testing.assert_allclose(ours, expect, rtol=1e-4, atol=1e-5)


def test_spec_augment_masks(rng):
    import jax

    spec = np.ones((3, 64, 100), np.float32)
    out = np.asarray(spec_augment(jax.random.PRNGKey(3), spec, 16, 25))
    assert out.shape == spec.shape
    # same mask across batch
    assert np.array_equal(out[0], out[1])
    # masked rows/cols are zeroed, others untouched
    assert ((out == 0) | (out == 1)).all()
    assert (out == 0).any()


def test_dft_impl_matches_rfft(rng):
    """The MXU matmul-DFT path (impl="dft", the TPU default) must equal
    the rfft path to float tolerance for both frontends."""
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    a = np.asarray(spectrogram(x, n_fft=512, hop=128, impl="rfft"))
    b = np.asarray(spectrogram(x, n_fft=512, hop=128, impl="dft"))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)
    a = np.asarray(mel_spectrogram(x, sr=16000, n_fft=512, hop=128, n_mels=64, impl="rfft"))
    b = np.asarray(mel_spectrogram(x, sr=16000, n_fft=512, hop=128, n_mels=64, impl="dft"))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_dft_bf16_impl_close_to_rfft(rng):
    """The bf16-input DFT (impl="dft_bf16", the training-path option) is
    NOT rfft-exact — bf16 frames carry ~0.4% relative rounding — but the
    LOG-mel the model consumes must stay within a small absolute band of
    the f32 path (well under the LayerNorm/SpecAugment noise floor)."""
    import jax.numpy as jnp

    from mod_extraction_tpu.ops.stft import log_mel_spectrogram

    x = rng.standard_normal((2, 8192)).astype(np.float32) * 0.3
    a = np.asarray(
        log_mel_spectrogram(x, sr=44100, n_fft=1024, hop=256, n_mels=128,
                            impl="rfft")
    )
    b = np.asarray(
        log_mel_spectrogram(x, sr=44100, n_fft=1024, hop=256, n_mels=128,
                            impl="dft_bf16")
    )
    assert b.dtype == np.float32  # f32 accumulation, not a bf16 output
    d = np.abs(b - a)
    # log compresses the ~0.5% power noise to a few 1e-3 absolute for
    # typical bins; near-null bins (spectral cancellation) can reach a
    # few 1e-1 in log domain — bound the envelope, not the worst null
    assert float(np.mean(d)) < 1e-2
    assert float(np.percentile(d, 99)) < 5e-2
    assert float(d.max()) < 1.0
