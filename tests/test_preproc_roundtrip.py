"""Preprocessed-dataset round trip: render triplets with the on-device
kernels (the scripts/generate_preproc_datasets.py path), write them to
disk, and read them back through PreprocessedDataset / the random
sampler — the reference's `random_preproc` workflow
(`scripts/scratch.py:117-162`, `datasets.py:504-551`)."""

import hashlib
import os

import jax
import numpy as np
import pytest

from mod_extraction_tpu.data.datasets import (
    PreprocessedDataset,
    RandomPreprocessedDataset,
    FlangerChorusDataset,
)
from mod_extraction_tpu.data.loader import Loader, collate
from mod_extraction_tpu.data.wav import wav_write
from mod_extraction_tpu.train.render import RenderConfig, render_batch

SR, N = 8000, 4000


@pytest.fixture(scope="module")
def preproc_dir(tmp_path_factory):
    rng = np.random.default_rng(5)
    src = tmp_path_factory.mktemp("src")
    for i in range(3):
        t = np.arange(SR * 2) / SR
        x = 0.4 * np.sin(2 * np.pi * (80 + 30 * i) * t) + 0.02 * rng.standard_normal(len(t))
        wav_write(str(src / f"s{i}.wav"), x.astype(np.float32)[None], SR)

    fx_config = {
        "mod_sig": {
            "rate_hz": {"min": 0.5, "max": 2.0},
            "phase": {"min": 0.0, "max": 6.28},
            "shapes": ["cos", "tri"],
            "exp": 1.0,
        },
        "flanger": {
            "max_min_delay_ms": 1.0,
            "max_lfo_delay_ms": 10.0,
            "feedback": {"min": 0.0, "max": 0.5},
            "min_delay_width": {"min": 0.0, "max": 1.0},
            "width": {"min": 0.5, "max": 1.0},
            "depth": {"min": 0.5, "max": 1.0},
            "mix": {"min": 0.5, "max": 1.0},
        },
    }
    ds = FlangerChorusDataset(
        fx_config, str(src), N, SR, num_examples_per_epoch=6, check_dataset=False
    )
    cfg = RenderConfig(sr=SR, n_samples=N, effects=(2,), max_delay_samples=89)
    batch = collate([ds.getitem(0, i) for i in range(6)])
    dry, wet, mod, fx = render_batch(batch, cfg)
    dry, wet, mod = (np.asarray(a) for a in (dry, wet, mod))
    fx_np = {k: np.asarray(v) for k, v in fx.items()}

    out = tmp_path_factory.mktemp("preproc")
    for i in range(6):
        h = hashlib.sha1(dry[i].tobytes()).hexdigest()[:16]
        wav_write(str(out / f"{h}_dry.wav"), dry[i], SR)
        wav_write(str(out / f"{h}_wet.wav"), wet[i], SR)
        fx_params = np.array(
            {k: np.asarray(v[i]).item() for k, v in fx_np.items()}, dtype=object
        )
        np.savez(str(out / f"{h}.npz"), mod_sig=mod[i], fx_params=fx_params)
    return str(out), wet


def test_preproc_read_back(preproc_dir):
    out, wet_orig = preproc_dir
    ds = PreprocessedDataset(out, N, SR)
    assert len(ds) == 6
    item = ds.getitem(0, 0)
    assert item["dry"].shape == (1, N) and item["wet"].shape == (1, N)
    # wet survives the 16-bit wav round trip
    assert np.max(np.abs(item["wet"])) > 0.01
    assert item["fx"]["effect_idx"] == 2
    assert 0.5 <= item["fx"]["rate_hz"] <= 2.0


def test_random_preproc_feeds_loader(preproc_dir):
    out, _ = preproc_dir
    ds = RandomPreprocessedDataset(8, out, N, SR, seed=1)
    loader = Loader(ds, batch_size=4, num_workers=2, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert batches[0]["dry"].shape == (4, 1, N)
    assert batches[0]["wet"].shape == (4, 1, N)
    assert batches[0]["fx"]["effect_idx"].tolist() == [2, 2, 2, 2]


def test_int16_transfer_mode(preproc_dir):
    """int16 wire format: loader quantizes, render_batch dequantizes;
    exact for PCM16-sourced audio."""
    out, _ = preproc_dir
    ds = PreprocessedDataset(out, N, SR)
    ref = collate([ds.getitem(0, i) for i in range(4)])
    q = collate([ds.getitem(0, i) for i in range(4)], transfer_dtype="int16")
    assert q["dry"].dtype == np.int16 and q["wet"].dtype == np.int16
    cfg = RenderConfig(sr=SR, n_samples=N, effects=())
    dry_f, wet_f, _, _ = render_batch(ref, cfg)
    dry_q, wet_q, _, _ = render_batch(q, cfg)
    # wavs are PCM16 on disk, so the int16 wire is bit-exact
    np.testing.assert_array_equal(np.asarray(dry_q), np.asarray(dry_f))
    np.testing.assert_array_equal(np.asarray(wet_q), np.asarray(wet_f))
