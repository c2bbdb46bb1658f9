"""Every shipped config must parse and build a RunConfig (data module +
task + optimizer) — the contract that the reference's experiment grid
transfers (SURVEY.md §5.6)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mod_extraction_tpu.cli import RunConfig, load_yaml_with_includes
from mod_extraction_tpu.paths import ROOT_DIR

CONFIGS = sorted(
    glob.glob(os.path.join(ROOT_DIR, "configs", "*.yml"))
)


@pytest.fixture(scope="module")
def lfo_weights(tmp_path_factory):
    """A real extractor weights file for configs that load one."""
    from mod_extraction_tpu.models import Spectral2DCNN
    from mod_extraction_tpu.train.checkpoints import save_weights

    model = Spectral2DCNN(
        in_ch=2, n_samples=88200, sr=44100, n_fft=1024, hop_len=256,
        n_mels=256, out_channels=(64,) * 6, temp_dilations=(1, 1, 2, 4, 8, 16),
        pool_size=(2, 1),
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 88200)))
    path = str(tmp_path_factory.mktemp("w") / "lfo.npz")
    save_weights(path, params["params"])
    return path


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path, lfo_weights):
    cfg = load_yaml_with_includes(path)
    if "model" not in cfg:
        pytest.skip("data-generator config, no task")
    margs = cfg["model"].get("init_args") or {}
    if "lfo_model_weights_path" in margs:
        margs["lfo_model_weights_path"] = lfo_weights
    run = RunConfig(cfg)
    assert run.task is not None
    assert run.data_module is not None
    # numeric config values must arrive as numbers, not YAML strings
    ds_args = (cfg["data"].get("init_args") or {}) if isinstance(cfg["data"], dict) else {}
    thr = ds_args.get("silence_threshold_energy")
    if thr is not None:
        assert isinstance(thr, float)


def test_lr_schedule_builds():
    """`optimizer.lr_schedule` (framework extension; the reference is
    constant-lr only) -> an optax schedule with warmup/peak/end."""
    from mod_extraction_tpu.cli import build_lr, build_optimizer

    cfg = {
        "class_path": "torch.optim.AdamW",
        "init_args": {"lr": 3e-5, "betas": [0.8, 0.99]},
        "lr_schedule": {
            "name": "cosine", "warmup_steps": 100,
            "decay_steps": 1000, "end_lr": 1e-6,
        },
    }
    sched = build_lr(cfg)
    assert callable(sched)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(100)) - 3e-5) < 1e-12
    assert abs(float(sched(1000)) - 1e-6) < 1e-12
    # monotone decay after the peak
    assert float(sched(500)) < 3e-5
    tx = build_optimizer(cfg)
    assert tx is not None

    lin = build_lr({**cfg, "lr_schedule": {"name": "linear", "decay_steps": 10}})
    assert abs(float(lin(0)) - 3e-5) < 1e-12
    assert float(lin(10)) < 1e-8

    const = build_lr({"init_args": {"lr": 2e-4}})
    assert const == 2e-4
