"""cli.validate_many: one compiled task swept over data/ckpt variants.
Checks per-variant ckpt reloading actually changes results, and that
model-block drift across variants is rejected loudly."""

import copy
import os

import jax
import numpy as np
import pytest
import yaml

from mod_extraction_tpu.cli import RunConfig, load_yaml_with_includes, validate_many
from mod_extraction_tpu.data.wav import wav_write
from mod_extraction_tpu.train.checkpoints import save_weights

SR, N = 8000, 4000


def _cfg(tmp, ckpt=None):
    cfg = {
        "seed_everything": 7,
        "custom": {
            "model_name": "m", "dataset_name": "d",
            "cpu_batch_size": 8,
            "cpu_train_num_examples_per_epoch": 8,
            "cpu_val_num_examples_per_epoch": 8,
        },
        "data": {
            "class_path": "mod_extraction.data_modules.RandomAudioChunkAndModSigDataModule",
            "init_args": {
                "batch_size": 8, "num_workers": 0,
                "train_dir": os.path.join(tmp, "wavs"),
                "val_dir": os.path.join(tmp, "wavs"),
                "train_num_examples_per_epoch": 8,
                "val_num_examples_per_epoch": 8,
                "n_samples": N, "sr": SR, "check_dataset": False,
                "fx_config": {"mod_sig": {
                    "rate_hz": {"min": 0.5, "max": 3.0},
                    "phase": {"min": 0.0, "max": 6.28},
                    "shapes": ["cos", "tri"], "exp": 1.0,
                }},
            },
        },
        "model": {
            "class_path": "mod_extraction.lightning.LFOExtraction",
            "init_args": {
                "use_dry": False, "model_smooth_n_frames": 0,
                "should_stretch": False, "loss_dict": {"l1": 1.0},
                "model": {
                    "class_path": "mod_extraction.models.Spectral2DCNN",
                    "init_args": {
                        "in_ch": 1, "n_fft": 256, "hop_len": 64, "n_mels": 16,
                        "out_channels": [4, 4], "bin_dilations": [1, 1],
                        "temp_dilations": [1, 2], "pool_size": [2, 1],
                    },
                },
            },
        },
    }
    if ckpt:
        cfg["ckpt_path"] = ckpt
    return cfg


@pytest.fixture()
def corpus_dir(tmp_path):
    d = os.path.join(str(tmp_path), "wavs")
    os.makedirs(d)
    rng = np.random.default_rng(3)
    for i in range(2):
        wav_write(os.path.join(d, f"x{i}.wav"),
                  rng.uniform(-0.5, 0.5, (1, 3 * SR)).astype(np.float32), SR)
    return str(tmp_path)


def test_per_variant_ckpt_reload(corpus_dir):
    tmp = corpus_dir
    # two different weight exports from the same model
    run = RunConfig(_cfg(tmp))
    k = jax.random.PRNGKey(0)
    s = run.task.init_state(k)
    inner = jax.tree.map(np.asarray, s.params["params"])
    save_weights(os.path.join(tmp, "a.npz"), inner)
    save_weights(
        os.path.join(tmp, "b.npz"),
        jax.tree.map(lambda a: a + 0.3, inner),
    )

    results = validate_many(
        [
            ("a", _cfg(tmp, os.path.join(tmp, "a.npz"))),
            ("b", _cfg(tmp, os.path.join(tmp, "b.npz"))),
        ],
        out_dir=os.path.join(tmp, "out"),
    )
    assert [lb for lb, _ in results] == ["a", "b"]
    assert results[0][1]["loss"] != results[1][1]["loss"]


def test_model_drift_rejected(corpus_dir):
    tmp = corpus_dir
    v1 = _cfg(tmp)
    v2 = copy.deepcopy(v1)
    v2["model"]["init_args"]["model_smooth_n_frames"] = 4
    with pytest.raises(AssertionError, match="model block"):
        validate_many([("a", v1), ("b", v2)], out_dir=os.path.join(tmp, "out"))
