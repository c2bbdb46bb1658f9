"""Warm-start path: `custom.init_weights_path` initializes a fresh fit
from a bare models/*.npz export (the continuation path when out/ has no
resumable checkpoint), and a restorable `last` checkpoint wins over it."""

import os

import jax
import numpy as np
import yaml

from mod_extraction_tpu.cli import fit
from mod_extraction_tpu.data.wav import wav_write
from mod_extraction_tpu.train.checkpoints import save_weights

SR, N = 8000, 4000


def _write_corpus(d):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        wav_write(
            os.path.join(d, f"x{i}_120bpm.wav"),
            rng.uniform(-0.5, 0.5, (1, 3 * SR)).astype(np.float32),
            SR,
        )


def _config(tmp, weights_path=None):
    cfg = {
        "seed_everything": 5,
        "custom": {
            "model_name": "m",
            "dataset_name": "d",
            # divisible by the conftest's 8-device virtual mesh
            "cpu_batch_size": 8,
            "cpu_train_num_examples_per_epoch": 8,
            "cpu_val_num_examples_per_epoch": 8,
        },
        "trainer": {"max_epochs": 0},
        "data": {
            "class_path": "mod_extraction.data_modules.RandomAudioChunkAndModSigDataModule",
            "init_args": {
                "batch_size": 2,
                "num_workers": 0,
                "train_dir": os.path.join(tmp, "wavs"),
                "val_dir": os.path.join(tmp, "wavs"),
                "train_num_examples_per_epoch": 2,
                "val_num_examples_per_epoch": 2,
                "n_samples": N,
                "sr": SR,
                "check_dataset": False,
                "fx_config": {
                    "mod_sig": {
                        "rate_hz": {"min": 0.5, "max": 3.0},
                        "phase": {"min": 0.0, "max": 6.28},
                        "shapes": ["cos", "tri"],
                        "exp": 1.0,
                    }
                },
            },
        },
        "model": {
            "class_path": "mod_extraction.lightning.LFOExtraction",
            "init_args": {
                "use_dry": False,
                "model_smooth_n_frames": 0,
                "should_stretch": False,
                "loss_dict": {"l1": 1.0},
                "model": {
                    "class_path": "mod_extraction.models.Spectral2DCNN",
                    "init_args": {
                        "in_ch": 1,
                        "n_fft": 256,
                        "hop_len": 64,
                        "n_mels": 16,
                        "out_channels": [4, 4],
                        "bin_dilations": [1, 1],
                        "temp_dilations": [1, 2],
                        "pool_size": [2, 1],
                    },
                },
            },
        },
    }
    if weights_path:
        cfg["custom"]["init_weights_path"] = weights_path
    path = os.path.join(tmp, "cfg.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def test_init_weights_path_warm_starts_fit(tmp_path):
    tmp = str(tmp_path)
    _write_corpus(os.path.join(tmp, "wavs"))

    # cold state from the config's model/seed (max_epochs 0: no steps)
    cold = fit(_config(tmp), out_dir=os.path.join(tmp, "out_a"))

    # perturb + export as a bare npz (the models/*.npz convention stores
    # the tree INSIDE the flax {"params": ...} wrapper)
    donor = jax.tree.map(lambda a: np.asarray(a) + 1.0, cold.params["params"])
    wp = os.path.join(tmp, "donor.npz")
    save_weights(wp, donor)

    warm = fit(_config(tmp, weights_path=wp), out_dir=os.path.join(tmp, "out_b"))
    for a, b in zip(jax.tree.leaves(warm.params["params"]), jax.tree.leaves(donor)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def _em_config(tmp, weights_path=None):
    """TBPTT stage-2 config (RandomLFO-conditioned LSTM, dry==wet corpus)."""
    cfg = {
        "seed_everything": 5,
        "custom": {
            "model_name": "em",
            "dataset_name": "d",
            "cpu_batch_size": 8,
            "cpu_train_num_examples_per_epoch": 8,
            "cpu_val_num_examples_per_epoch": 8,
        },
        "trainer": {"max_epochs": 0},
        "data": {
            "class_path": "mod_extraction.data_modules.RandomAudioChunkDryWetDataModule",
            "init_args": {
                "batch_size": 2,
                "num_workers": 0,
                "dry_train_dir": os.path.join(tmp, "wavs"),
                "dry_val_dir": os.path.join(tmp, "wavs"),
                "wet_train_dir": os.path.join(tmp, "wavs"),
                "wet_val_dir": os.path.join(tmp, "wavs"),
                "train_num_examples_per_epoch": 2,
                "val_num_examples_per_epoch": 2,
                "n_samples": N,
                "sr": SR,
                "check_dataset": False,
            },
        },
        "model": {
            "class_path": "mod_extraction.lightning.TBPTTLFOEffectModeling",
            "init_args": {
                "warmup_n_samples": 256,
                "step_n_samples": 256,
                "effect_model": {
                    "class_path": "mod_extraction.models.LSTMEffectModel",
                    "init_args": {
                        "in_ch": 1, "out_ch": 1, "n_hidden": 8, "latent_dim": 1
                    },
                },
                "lfo_model": {
                    "class_path": "mod_extraction.models.RandomLFO",
                    "init_args": {
                        "n_samples": 63,
                        "sr": 125.0,
                        "shapes": ["tri"],
                        "freq_min": 1.5,
                        "freq_max": 2.0,
                    },
                },
                "model_smooth_n_frames": 0,
                "should_stretch": False,
                "discard_invalid_lfos": False,
                "loss_dict": {"l1": 1.0},
            },
        },
    }
    if weights_path:
        cfg["custom"]["init_weights_path"] = weights_path
    path = os.path.join(tmp, "em_cfg.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def test_init_weights_path_warm_starts_tbptt(tmp_path):
    """Continuation path for stage-2 LSTMs whose out/ was cleaned: a bare
    models/lstm_64__*.npz export seeds a fresh TBPTT fit."""
    tmp = str(tmp_path)
    _write_corpus(os.path.join(tmp, "wavs"))

    cold = fit(_em_config(tmp), out_dir=os.path.join(tmp, "out_a"))

    donor = jax.tree.map(lambda a: np.asarray(a) + 1.0, cold.params["params"])
    wp = os.path.join(tmp, "donor.npz")
    save_weights(wp, donor)

    warm = fit(_em_config(tmp, weights_path=wp), out_dir=os.path.join(tmp, "out_b"))
    for a, b in zip(jax.tree.leaves(warm.params["params"]), jax.tree.leaves(donor)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resume_checkpoint_wins_over_warm_start(tmp_path):
    tmp = str(tmp_path)
    _write_corpus(os.path.join(tmp, "wavs"))
    out = os.path.join(tmp, "out")

    # one real epoch -> writes a `last` checkpoint
    trained = fit(_config(tmp), out_dir=out, max_epochs=1)

    donor = jax.tree.map(lambda a: np.asarray(a) + 1.0, trained.params["params"])
    wp = os.path.join(tmp, "donor.npz")
    save_weights(wp, donor)

    # resume with BOTH a last ckpt and init_weights_path: ckpt must win
    resumed = fit(
        _config(tmp, weights_path=wp), out_dir=out, resume=True, max_epochs=1
    )
    for a, b in zip(
        jax.tree.leaves(resumed.params["params"]),
        jax.tree.leaves(trained.params["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
