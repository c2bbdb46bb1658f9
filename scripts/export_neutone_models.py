"""Export trained LSTM-64 effect models for real-time streaming use
(reference `scripts/export_neutone_models.py`).

Writes, per model, a directory with weights (.npz) + metadata.json and
runs a streaming self-check: chunked inference across random buffer
sizes must match full-sequence inference (the functional contract of the
reference's Neutone `.nm` export — state carried across any buffer size).

Usage: python scripts/export_neutone_models.py [weights.npz ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MODEL_NAMES = [
    "lstm_64__lfo_2dcnn_io_sa_25_25_no_ch_ln__egfx_ph_2_peak",
    "lstm_64__lfo_2dcnn_io_sa_25_25_no_ch_ln__egfx_fl_2_peak",
    "lstm_64__lfo_2dcnn_io_sa_25_25_no_ch_ln__egfx_ch_2_peak",
    "lstm_64__lfo_2dcnn_io_sa_25_25_no_ch_ln__melda_ph_irregular",
    "lstm_64__lfo_2dcnn_io_sa_25_25_no_ch_ln__melda_fl_quasi",
]


def streaming_self_check(sm, seed: int = 0, total: int = 4096) -> None:
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.5, 0.5, (sm.n_channels, total)).astype(np.float32)
    y_full, _ = sm.process_np(sm.init_state(), x)
    state = sm.init_state()
    outs, i = [], 0
    while i < total:
        n = int(rng.integers(64, 1024))
        n = min(n, total - i)
        y, state = sm.process_np(state, x[:, i : i + n])
        outs.append(y)
        i += n
    y_chunked = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(y_chunked, y_full, atol=1e-5)


if __name__ == "__main__":
    from mod_extraction_tpu.export.streaming import (
        StreamingEffectModel,
        export_streaming_model,
    )
    from mod_extraction_tpu.paths import MODELS_DIR, OUT_DIR
    from mod_extraction_tpu.train.checkpoints import load_weights

    targets = sys.argv[1:] or [
        os.path.join(MODELS_DIR, f"{n}.npz") for n in MODEL_NAMES
    ]
    for path in targets:
        if not os.path.isfile(path):
            print(f"skip (missing): {path}")
            continue
        name = os.path.splitext(os.path.basename(path))[0]
        params = {"params": load_weights(path)}
        out = export_streaming_model(params, os.path.join(OUT_DIR, "exports"), name)
        sm = StreamingEffectModel(params)
        streaming_self_check(sm)
        print(f"exported + stream-verified: {out}")
