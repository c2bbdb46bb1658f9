"""MetricLogger's TensorBoard sink (VERDICT r2 missing #5): scalar
events must be written in the real tfevents format so existing TB
tooling can plot runs — verified by reading the file back with
tensorboard's own event loader."""

import glob
import os

from mod_extraction_tpu.train.loop import MetricLogger


def test_metric_logger_writes_readable_tfevents(tmp_path):
    m = MetricLogger(str(tmp_path), "run1")
    m.log({"phase": "train_step", "step": 3, "loss": 0.5, "l1": 0.25})
    m.log(
        {
            "phase": "epoch",
            "epoch": 0,
            "step": 10,
            "train/loss": 0.4,
            "val/loss": 0.3,
            "note": "non-numeric values are skipped",
        }
    )
    m.close()

    files = glob.glob(str(tmp_path / "run1_tb" / "events.out.tfevents.*"))
    assert len(files) == 1

    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )
    from tensorboard.util import tensor_util

    scalars = {}
    for ev in EventFileLoader(files[0]).Load():
        for v in ev.summary.value:
            # TB 2.x loaders migrate simple_value -> tensor (data_compat)
            val = (
                float(tensor_util.make_ndarray(v.tensor))
                if v.WhichOneof("value") == "tensor"
                else v.simple_value
            )
            scalars[(v.tag, ev.step)] = val
    assert abs(scalars[("loss", 3)] - 0.5) < 1e-6
    assert abs(scalars[("l1", 3)] - 0.25) < 1e-6
    assert abs(scalars[("train/loss", 10)] - 0.4) < 1e-6
    assert abs(scalars[("val/loss", 10)] - 0.3) < 1e-6
    assert not any(tag == "note" for tag, _ in scalars)
    # phase/step/epoch are structural, not scalars
    assert not any(tag in ("phase", "step", "epoch") for tag, _ in scalars)


def test_metric_logger_tb_opt_out(tmp_path):
    m = MetricLogger(str(tmp_path), "run2", tensorboard=False)
    m.log({"phase": "train_step", "step": 1, "loss": 1.0})
    m.close()
    assert not os.path.isdir(tmp_path / "run2_tb")
    assert (tmp_path / "run2_metrics.jsonl").exists()
