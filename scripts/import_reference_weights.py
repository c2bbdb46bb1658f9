"""Convert reference torch `.pt` weight files into this framework's
`.npz` weight format (the bridge consumed by `lfo_model_weights_path`,
`scripts/export_neutone_models.py`, and `configs/eval_em_unseen_effect.yml`).

Usage:
  python scripts/import_reference_weights.py <in.pt> <out.npz> [kind]

`kind`: `lstm` (LSTMEffectModel, default) or `2dcnn` (Spectral2DCNN;
needs the layer count, inferred from the key pattern).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    import torch

    from mod_extraction_tpu.models.torch_port import (
        port_lstm_effect_model,
        port_spectral_2dcnn,
    )
    from mod_extraction_tpu.train.checkpoints import save_weights

    in_path, out_path = sys.argv[1], sys.argv[2]
    kind = sys.argv[3] if len(sys.argv) > 3 else "lstm"

    sd = torch.load(in_path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in sd.items()}
    if kind == "lstm":
        params = port_lstm_effect_model(sd)
    elif kind == "2dcnn":
        n_layers = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("cnn.")
        ) // 4
        params = port_spectral_2dcnn(sd, n_layers)
    else:
        raise SystemExit(f"unknown kind: {kind}")
    save_weights(out_path, params)
    print(f"wrote {out_path}")
