"""Compiled multi-step dispatch (`task.train_steps`, a lax.scan of
optimizer updates in one device program — the trainer's
`steps_per_dispatch` path, which amortizes the per-dispatch host round
trip that dominates under remote-tunnel TPUs): it must reproduce the
per-step `train_step` loop exactly, and the Trainer path must train."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from mod_extraction_tpu.data.synthetic import make_synthetic_batch
from mod_extraction_tpu.models import LSTMEffectModel, Spectral2DCNN
from mod_extraction_tpu.train.lfo_task import LFOExtractionTask
from mod_extraction_tpu.train.render import RenderConfig
from mod_extraction_tpu.train.tbptt_task import TBPTTEffectModelingTask

SR, N = 8000.0, 4000


def _cfg():
    return RenderConfig(sr=SR, n_samples=N, effects=(1, 2, 3), max_delay_samples=89)


def _stack_batches(batches):
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)


def _run_both(task, n_steps: int = 3, batch_size: int = 4):
    key = jax.random.PRNGKey(0)
    batches = [
        make_synthetic_batch(i, batch_size, N, SR, "flanger")
        for i in range(n_steps)
    ]
    keys = [jax.random.fold_in(key, i) for i in range(n_steps)]

    # sequential per-step dispatch
    state = task.init_state(key)
    seq_losses = []
    for b, k in zip(batches, keys):
        state, m = task.train_step(state, jax.tree.map(jnp.asarray, b), k)
        seq_losses.append(float(m["loss"]))
    seq_params = jax.device_get(state.params)

    # one compiled scan-of-steps dispatch
    state2 = task.init_state(key)
    state2, ms = task.train_steps(state2, _stack_batches(batches), jnp.stack(keys))
    scan_losses = [float(v) for v in np.asarray(ms["loss"])]
    scan_params = jax.device_get(state2.params)
    return seq_losses, seq_params, scan_losses, scan_params


def test_lfo_train_steps_matches_sequential():
    model = Spectral2DCNN(
        in_ch=2, n_samples=N, sr=SR, n_fft=256, hop_len=64, n_mels=32,
        out_channels=(8, 8), bin_dilations=(1, 1), temp_dilations=(1, 2),
        pool_size=(2, 1),
    )
    task = LFOExtractionTask(model=model, render_cfg=_cfg())
    seq_losses, seq_params, scan_losses, scan_params = _run_both(task)
    np.testing.assert_allclose(scan_losses, seq_losses, rtol=1e-5, atol=1e-6)
    flat_seq = jax.tree_util.tree_leaves_with_path(seq_params)
    flat_scan = dict(jax.tree_util.tree_leaves_with_path(scan_params))
    for path, leaf in flat_seq:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_scan[path]),
            atol=1e-6, rtol=1e-5, err_msg=str(path),
        )


def test_tbptt_train_steps_matches_sequential():
    task = TBPTTEffectModelingTask(
        effect_model=LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=8, latent_dim=1),
        render_cfg=_cfg(), warmup_n_samples=256, step_n_samples=256,
        lfo_model=None, model_smooth_n_frames=8, should_stretch=True,
    )
    seq_losses, seq_params, scan_losses, scan_params = _run_both(task, n_steps=2)
    np.testing.assert_allclose(scan_losses, seq_losses, rtol=1e-5, atol=1e-6)
    flat_seq = jax.tree_util.tree_leaves_with_path(seq_params)
    flat_scan = dict(jax.tree_util.tree_leaves_with_path(scan_params))
    for path, leaf in flat_seq:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_scan[path]),
            atol=1e-6, rtol=1e-5, err_msg=str(path),
        )


def test_trainer_steps_per_dispatch_fit(tmp_path):
    """An end-to-end fit through `custom.steps_per_dispatch: 2` with a
    3-batch epoch (so the tail group exercises the smaller re-compile)
    must complete and log one metric record per STEP, not per group."""
    from mod_extraction_tpu.cli import fit
    from mod_extraction_tpu.data.wav import wav_write

    tmp = str(tmp_path)
    wavs = os.path.join(tmp, "wavs")
    os.makedirs(wavs)
    rng = np.random.default_rng(0)
    for i in range(2):
        wav_write(
            os.path.join(wavs, f"x{i}_120bpm.wav"),
            rng.uniform(-0.5, 0.5, (1, 3 * int(SR))).astype(np.float32),
            int(SR),
        )
    cfg = {
        "seed_everything": 5,
        "custom": {
            "model_name": "m", "dataset_name": "d",
            "cpu_batch_size": 8,
            "cpu_train_num_examples_per_epoch": 24,  # 3 batches @ 8
            "cpu_val_num_examples_per_epoch": 8,
            "steps_per_dispatch": 2,
            "log_every_n_steps": 1,
        },
        "trainer": {"max_epochs": 1},
        "data": {
            "class_path": "mod_extraction.data_modules.RandomAudioChunkAndModSigDataModule",
            "init_args": {
                "batch_size": 8, "num_workers": 0,
                "train_dir": wavs, "val_dir": wavs,
                "train_num_examples_per_epoch": 24,
                "val_num_examples_per_epoch": 8,
                "n_samples": N, "sr": SR, "check_dataset": False,
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
    cfg_path = os.path.join(tmp, "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = os.path.join(tmp, "out")
    state = fit(cfg_path, out_dir=out)
    assert int(np.asarray(state.step)) == 3  # 2-step group + 1-step tail
    import json
    import glob

    (metrics_path,) = glob.glob(os.path.join(out, "*_metrics.jsonl"))
    with open(metrics_path) as f:
        records = [json.loads(line) for line in f]
    step_lines = [r for r in records if r.get("phase") == "train_step"]
    assert [r["step"] for r in step_lines] == [1, 2, 3]
    assert all(np.isfinite(r["loss"]) for r in step_lines)
