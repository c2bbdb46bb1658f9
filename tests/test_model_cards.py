"""Model-card writer contracts (scripts/write_model_cards.py — the
analog of the reference's `models/*.yml` convention): every shipped
`.npz` must have a registered card, and regenerating cards on a host
whose `out/` training metrics did not survive a VM reset must preserve
the metrics already recorded in the committed cards instead of silently
dropping them."""

import glob
import importlib.util
import json
import os

_REPO = os.path.join(os.path.dirname(__file__), "..")
_SPEC = importlib.util.spec_from_file_location(
    "write_model_cards", os.path.join(_REPO, "scripts", "write_model_cards.py")
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


def test_every_shipped_npz_has_a_registered_card():
    """The unattended lineage chains run the card writer last; an
    unregistered stem would make them exit nonzero after the expensive
    training already happened."""
    stems = [
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(_REPO, "models", "*.npz"))
    ]
    assert stems, "no shipped models found"
    unregistered = [
        s for s in stems if s not in _MOD.REGISTRY and s not in _MOD.REFERENCE_IMPORTS
    ]
    assert unregistered == []


def test_final_epoch_metrics_picks_last_epoch_record(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("out")
    with open("out/run_metrics.jsonl", "w") as f:
        f.write(json.dumps({"phase": "train_step", "loss": 9.0}) + "\n")
        f.write(
            json.dumps({"phase": "epoch", "epoch": 0, "val/loss": 0.5, "val/l1": 0.4})
            + "\n"
        )
        f.write(
            json.dumps({"phase": "epoch", "epoch": 1, "val/loss": 0.3, "val/l1": 0.2})
            + "\n"
        )
    rec = _MOD.final_epoch_metrics("run")
    assert rec["epoch"] == 1 and rec["val/loss"] == 0.3
    assert _MOD.final_epoch_metrics("absent_run") is None


def test_existing_card_metrics_survive_missing_out_dir(tmp_path, monkeypatch):
    """A committed card's epochs_trained/final_val_metrics must be reused
    when the training run's out/ metrics are gone (VM reset)."""
    monkeypatch.chdir(tmp_path)
    os.makedirs("models")
    with open("models/stem.yml", "w") as f:
        f.write(
            "name: stem\nepochs_trained: 25\n"
            "final_val_metrics:\n  loss: 0.123\n  l1: 0.1\n"
        )
    epochs, metrics = _MOD.existing_card_metrics("stem")
    assert epochs == 25
    assert metrics == {"loss": 0.123, "l1": 0.1}
    assert _MOD.existing_card_metrics("other") == (None, None)


def test_r5_card_pins_best_val_loss(monkeypatch):
    """The r5 run's out/ metrics predate this host; its card records the
    export guard's monitored best (commit 057e6fd) via the registry pin."""
    monkeypatch.chdir(_REPO)
    stem = "lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r5"
    card = _MOD.build_card(stem)
    assert card["best_val_loss"] == _MOD.REGISTRY[stem]["best_val_loss"]
    assert card["train_config"] == "configs/train_lfo_interwoven_all_live_r5.yml"
