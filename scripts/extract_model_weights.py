"""Strip a training checkpoint down to bare model weights (reference
`scripts/extract_model_weights.py`): the hand-off between extractor
training -> effect-model training -> streaming export.

Usage:
  python scripts/extract_model_weights.py <ckpt_dir> <out.npz> [attribute]

`ckpt_dir` is an Orbax checkpoint directory written by the Trainer
(`out/<run>/checkpoints/best`); `attribute` selects which sub-tree to
keep: `model` (LFO extractor, default) or `effect_model` (LSTM-64).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    import orbax.checkpoint as ocp

    from mod_extraction_tpu.train.checkpoints import save_weights

    ckpt_dir, out_path = sys.argv[1], sys.argv[2]
    attribute = sys.argv[3] if len(sys.argv) > 3 else "model"

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(ckpt_dir))
    # TrainState pytrees: {"params": ..., "opt_state": ..., ...} for the
    # LFO task; TBPTT keeps effect-model params under "params" and the
    # frozen extractor under "lfo_params".
    if attribute in ("model", "effect_model"):
        params = state["params"]
        if isinstance(params, dict) and "effect" in params:
            params = params["effect"]  # multi-component TBPTT layout
    elif attribute == "lfo_model":
        params = state["params"].get("lfo") or state["lfo_params"]
        if isinstance(params, dict) and "params" in params:
            params = params["params"]
    elif attribute == "param_model":
        params = state["params"]["param"]
    else:
        raise SystemExit(f"unknown attribute: {attribute}")
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    save_weights(out_path, params)
    print(f"wrote {out_path}")
