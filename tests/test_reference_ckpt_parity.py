"""Parity against the reference's SHIPPED trained checkpoints: port a real
LSTM-64 `.pt` (trained EGFx phaser effect model) and compare our scanned
LSTM's output with torch running the same weights, then check streaming
(chunked == full) on the ported model.  Skipped when the reference repo
is not mounted."""

import os

import numpy as np
import pytest

REF_PT = (
    "/root/reference/models/"
    "lstm_64__lfo_2dcnn_io_sa_25_25_no_ch_ln__egfx_ph_2_peak__epoch_35_step_95616.pt"
)

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_PT), reason="reference checkpoints not available"
)


@pytest.fixture(scope="module")
def ported():
    import torch

    from mod_extraction_tpu.models.torch_port import port_lstm_effect_model

    sd = torch.load(REF_PT, map_location="cpu", weights_only=False)
    np_sd = {k: v.numpy() for k, v in sd.items()}
    return np_sd, port_lstm_effect_model(np_sd)


def test_real_lstm64_forward_parity(ported, rng):
    import torch

    from mod_extraction_tpu.models.lstm import LSTMEffectModel, lstm_init_state

    np_sd, params = ported
    b, t = 3, 400
    x = (0.2 * rng.standard_normal((b, 1, t))).astype(np.float32)
    lat = rng.uniform(0, 1, (b, 1, t)).astype(np.float32)

    # torch reference: LSTM(2, 64) + Linear + residual + tanh
    tl = torch.nn.LSTM(2, 64, batch_first=True)
    fc = torch.nn.Linear(64, 1)
    tl.load_state_dict({k.split("lstm.")[1]: torch.from_numpy(v)
                        for k, v in np_sd.items() if k.startswith("lstm.")})
    fc.load_state_dict({k.split("fc.")[1]: torch.from_numpy(v)
                        for k, v in np_sd.items() if k.startswith("fc.")})
    inp = torch.from_numpy(np.concatenate([lat, x], 1)).swapaxes(1, 2)
    with torch.no_grad():
        out, _ = tl(inp)
        ref = torch.tanh(fc(out).swapaxes(1, 2) + torch.from_numpy(x)).numpy()

    model = LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=64, latent_dim=1)
    y, _ = model.apply({"params": params}, x, lat, lstm_init_state(b, 64))
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-6)


def test_real_lstm64_streaming_chunked_equals_full(ported, rng):
    from mod_extraction_tpu.export.streaming import StreamingEffectModel

    _, params = ported
    sm = StreamingEffectModel({"params": params}, n_hidden=64, n_channels=2)
    total = 2048
    x = rng.uniform(-0.4, 0.4, (2, total)).astype(np.float32)
    y_full, _ = sm.process_np(sm.init_state(), x)
    state = sm.init_state()
    outs, i = [], 0
    while i < total:
        n = min(int(rng.integers(37, 517)), total - i)
        y, state = sm.process_np(state, x[:, i : i + n])
        outs.append(y)
        i += n
    np.testing.assert_allclose(np.concatenate(outs, -1), y_full, atol=1e-5)
