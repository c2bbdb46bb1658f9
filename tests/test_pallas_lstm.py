"""Pallas fused LSTM effect-model kernel vs the flax scan implementation
(which is itself torch-parity tested), incl. cross-chunk state carry and
state continuation (streaming semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from mod_extraction_tpu.models.lstm import LSTMEffectModel, lstm_init_state
from mod_extraction_tpu.ops.pallas_lstm import lstm_effect_model_pallas


def _setup(rng, b=3, t=700, hid=16, lat=1):
    model = LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=hid, latent_dim=lat)
    x = jnp.asarray((0.3 * rng.standard_normal((b, 1, t))).astype(np.float32))
    latent = jnp.asarray(rng.uniform(0, 1, (b, lat, t)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, latent, lstm_init_state(b, hid))
    return model, params, x, latent


def test_pallas_lstm_matches_scan(rng):
    b, t, hid = 3, 700, 16
    model, params, x, latent = _setup(rng, b, t, hid)
    h0 = lstm_init_state(b, hid)
    y_ref, (h_ref, c_ref) = model.apply(params, x, latent, h0)
    y, (h, c) = lstm_effect_model_pallas(
        params, x, latent, h0, t_chunk=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=2e-6)


def test_pallas_lstm_state_continuation(rng):
    """Processing in two calls with carried state == one call (the
    streaming contract)."""
    b, t, hid = 2, 512, 16
    model, params, x, latent = _setup(rng, b, t, hid)
    h0 = lstm_init_state(b, hid)
    y_full, _ = lstm_effect_model_pallas(
        params, x, latent, h0, t_chunk=128, interpret=True
    )
    cut = 320
    y1, st = lstm_effect_model_pallas(
        params, x[:, :, :cut], latent[:, :, :cut], h0, t_chunk=128, interpret=True
    )
    y2, _ = lstm_effect_model_pallas(
        params, x[:, :, cut:], latent[:, :, cut:], st, t_chunk=128, interpret=True
    )
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)], -1),
        np.asarray(y_full),
        atol=2e-6,
    )
