"""The serialized StableHLO processor artifact must reproduce the live
(model-code) streaming path: weights baked in, symbolic buffer dim (no
per-size retrace), loadable without the model definition — the
serialized-module contract of the reference's TorchScript `.nm` export
(`scripts/export_neutone_models.py:135-138`)."""

import jax
import jax.numpy as jnp
import numpy as np

from mod_extraction_tpu.export.streaming import (
    StreamingEffectModel,
    export_streaming_model,
    load_compiled_processor,
    load_streaming_model,
)
from mod_extraction_tpu.models.lstm import LSTMEffectModel, lstm_init_state


def _random_params(n_hidden=8):
    model = LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=n_hidden, latent_dim=1)
    x = jnp.zeros((2, 1, 16))
    lfo = jnp.zeros((2, 1, 16))
    state = lstm_init_state(2, n_hidden)
    return model.init(jax.random.PRNGKey(3), x, lfo, state)


def test_artifact_matches_live_path_any_buffer_size(tmp_path):
    params = _random_params()
    target = export_streaming_model(
        params, str(tmp_path), "test_model", n_hidden=8
    )

    live = load_streaming_model(target)
    compiled = load_compiled_processor(target)

    rng = np.random.default_rng(0)
    total = 2048
    x = rng.uniform(-0.5, 0.5, (2, total)).astype(np.float32)

    y_live, _ = live.process_np(live.init_state(), x, lfo_rate=1.3,
                                lfo_depth=0.9, stereo_offset=0.5)

    # chunked drive of the DESERIALIZED artifact across uneven buffers
    state = compiled.init_state()
    outs, i = [], 0
    while i < total:
        n = min(int(rng.integers(48, 600)), total - i)
        y, state = compiled.process_np(state, x[:, i : i + n], lfo_rate=1.3,
                                       lfo_depth=0.9, stereo_offset=0.5)
        outs.append(y)
        i += n
    y_artifact = np.concatenate(outs, axis=-1)

    np.testing.assert_allclose(y_artifact, y_live, atol=1e-5)


def test_artifact_is_self_contained_and_multiplatform(tmp_path):
    params = _random_params()
    target = export_streaming_model(
        params, str(tmp_path), "test_model2", n_hidden=8
    )
    compiled = load_compiled_processor(target)
    assert set(compiled.exported.platforms) == {"cpu", "tpu"}
    # symbolic buffer dim: the input x aval (2, t) carries a non-constant
    # time axis (in_avals is the flattened (state, x, knobs) tree)
    symbolic_axes = [
        d
        for aval in compiled.exported.in_avals
        for d in aval.shape
        if not isinstance(d, int)
    ]
    assert len(symbolic_axes) == 1
