"""Native C++ host-path library: build + parity vs the numpy reference
implementations (wav decode and silence scan)."""

import os

import numpy as np
import pytest

from mod_extraction_tpu import native
from mod_extraction_tpu.data.wav import wav_read, wav_write


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    rng = np.random.default_rng(3)
    path = str(tmp_path_factory.mktemp("wav") / "x.wav")
    audio = (0.4 * rng.standard_normal((2, 5000))).astype(np.float32)
    wav_write(path, audio, 22050, bits=16)
    return path


def test_native_builds():
    assert native.available(), "native library failed to build/load"


def test_native_wav_chunk_matches_numpy(wav_file):
    assert native.available()
    got = native.wav_read_chunk(wav_file, 123, 1000)
    assert got is not None
    chunk, sr_n = got
    assert chunk.shape == (2, 1000) and sr_n == 22050
    # numpy reference decode of the same chunk
    os.environ["MODX_NATIVE"] = "1"
    full, sr = wav_read(wav_file)  # full read takes the numpy path
    np.testing.assert_allclose(chunk, full[:, 123:1123], atol=0)
    assert sr == 22050


def test_native_silence_scan_matches_numpy(rng):
    from mod_extraction_tpu.data.datasets import RandomAudioChunkDataset

    x = rng.uniform(-0.5, 0.5, (1, 4000)).astype(np.float32)
    x[0, 1000:1600] = 1e-5  # silent stretch
    w, hop, thr = 500, 125, 1e-6

    def np_scan(chunk, threshold):
        energy = chunk**2
        t = chunk.shape[-1]
        n_win = (t - w) // hop + 1
        cs = np.concatenate(
            [np.zeros(energy.shape[:-1] + (1,)), np.cumsum(energy, -1)], -1
        )
        starts = np.arange(n_win) * hop
        means = (cs[..., starts + w] - cs[..., starts]) / w
        return bool((means < threshold).any())

    for threshold in (1e-6, 1e-9, 1.0):
        got = native.silence_scan(x, w, hop, threshold)
        assert got is not None
        assert got == np_scan(x, threshold), f"threshold={threshold}"
