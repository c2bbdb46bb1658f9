"""Reference-checkpoint porting: torch state_dict -> flax params.

The reference ships trained weights as bare torch `state_dict`s
(`scripts/extract_model_weights.py:30-47`).  These helpers convert the
tensor layouts (torch OIHW conv kernels -> flax HWIO, linear (O, I) ->
(I, O), LSTM fused-gate weights transposed with biases summed) so
reference models can be loaded for parity evaluation.

Works on plain dicts of numpy arrays — no torch import required at call
time (pass `{k: v.numpy() for k, v in sd.items()}`).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I, kH, kW) -> (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I, k) -> (k, I, O)."""
    return np.transpose(w, (2, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I) -> (I, O)."""
    return np.transpose(w, (1, 0))


def port_lstm_effect_model(sd: Dict[str, np.ndarray]) -> dict:
    """torch `LSTMEffectModel` state_dict -> flax params for
    `mod_extraction_tpu.models.lstm.LSTMEffectModel`.

    torch keys: lstm.weight_ih_l0 (4H, in), lstm.weight_hh_l0 (4H, H),
    lstm.bias_ih_l0 + lstm.bias_hh_l0, fc.weight (out, H), fc.bias."""
    return {
        "w_ih": linear_kernel(sd["lstm.weight_ih_l0"]),
        "w_hh": linear_kernel(sd["lstm.weight_hh_l0"]),
        "b_gates": sd["lstm.bias_ih_l0"] + sd["lstm.bias_hh_l0"],
        "fc": {
            "kernel": linear_kernel(sd["fc.weight"]),
            "bias": sd["fc.bias"],
        },
    }


def port_spectral_2dcnn(sd: Dict[str, np.ndarray], n_layers: int) -> dict:
    """torch `Spectral2DCNN` state_dict -> flax params.

    The torch model packs layers into an `nn.Sequential` named `cnn` whose
    per-layer indices depend on use_ln (LN has no params so the pattern is
    cnn.{conv_idx}.weight/bias then cnn.{prelu_idx}.weight).  With
    use_ln=True the module order per block is [LN, Conv2d, MaxPool, PReLU]
    => conv at 4k+1, prelu at 4k+3; output head is `output` (Conv1d 1x1).
    """
    params: dict = {}
    for k in range(n_layers):
        conv_w = sd[f"cnn.{4 * k + 1}.weight"]
        conv_b = sd[f"cnn.{4 * k + 1}.bias"]
        prelu = sd[f"cnn.{4 * k + 3}.weight"]
        params[f"Conv_{k}"] = {
            "kernel": conv2d_kernel(conv_w),
            "bias": conv_b,
        }
        params[f"PReLU_{k}"] = {"alpha": prelu}
    out_w = sd["output.weight"]  # (latent_dim, C, 1)
    params["Dense_0"] = {
        "kernel": linear_kernel(out_w[:, :, 0]),
        "bias": sd["output.bias"],
    }
    return params


def port_tcn(sd: Dict[str, np.ndarray], n_blocks: int, prefix: str = "") -> dict:
    """torch `TCN` state_dict -> flax params for `models.tcn.TCN`.

    torch keys per block i (reference `tcn.py:140-171`):
    blocks.{i}.conv.weight/bias, blocks.{i}.act.weight (PReLU),
    blocks.{i}.res.weight (1x1, no bias); LayerNorm has no params."""
    params: dict = {}
    for i in range(n_blocks):
        p = f"{prefix}blocks.{i}."
        block: dict = {
            "conv": {
                "kernel": conv1d_kernel(sd[p + "conv.weight"]),
                "bias": sd[p + "conv.bias"],
            }
        }
        if p + "act.weight" in sd:
            block["act"] = {"alpha": sd[p + "act.weight"]}
        if p + "res.weight" in sd:
            block["res"] = {"kernel": conv1d_kernel(sd[p + "res.weight"])}
        params[f"block_{i}"] = block
    return params


def port_spectral_tcn(sd: Dict[str, np.ndarray], n_blocks: int) -> dict:
    """torch `SpectralTCN` -> flax params (`models.py:72-125`): a TCN
    under `tcn.` plus the 1x1 `output` Conv1d head."""
    return {
        "tcn": port_tcn(sd, n_blocks, prefix="tcn."),
        "output": {
            "kernel": linear_kernel(sd["output.weight"][:, :, 0]),
            "bias": sd["output.bias"],
        },
    }
