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


def test_pallas_lstm_train_grads_match_autodiff(rng):
    """custom-VJP kernel pair vs jax.grad of the scan model: y and ALL
    input/param gradients, incl. cross-chunk reversal and time padding."""
    from mod_extraction_tpu.ops.pallas_lstm import (
        lstm_effect_model_pallas_train,
    )

    b, t, hid = 3, 300, 16  # t not a multiple of TRAIN_T_CHUNK -> padding
    model, params, x, latent = _setup(rng, b, t, hid)
    h0 = lstm_init_state(b, hid)
    tgt = jnp.asarray(rng.standard_normal((b, 1, t)).astype(np.float32))

    def loss_scan(p, x, lat):
        y, _ = model.apply(p, x, lat, h0)
        return jnp.mean((y - tgt) ** 2)

    def loss_pal(p, x, lat):
        y, _ = lstm_effect_model_pallas_train(p, x, lat, h0, interpret=True)
        return jnp.mean((y - tgt) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_scan, argnums=(0, 1, 2))(
        params, x, latent
    )
    l_pal, g_pal = jax.value_and_grad(loss_pal, argnums=(0, 1, 2))(
        params, x, latent
    )
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pal = jax.tree.leaves(g_pal)
    assert len(flat_ref) == len(flat_pal)
    for a, r in zip(flat_pal, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-6
        )


def test_pallas_lstm_train_state_cotangents(rng):
    """Gradient w.r.t. the initial hidden state (the TBPTT carry)."""
    from mod_extraction_tpu.ops.pallas_lstm import (
        lstm_effect_model_pallas_train,
    )

    b, t, hid = 2, 130, 16
    model, params, x, latent = _setup(rng, b, t, hid)
    h0 = (
        jnp.asarray(0.1 * rng.standard_normal((b, hid)).astype(np.float32)),
        jnp.asarray(0.1 * rng.standard_normal((b, hid)).astype(np.float32)),
    )

    def loss_scan(st):
        y, (hn, cn) = model.apply(params, x, latent, st)
        return jnp.mean(y**2) + jnp.mean(hn**2) + jnp.mean(cn**2)

    def loss_pal(st):
        y, (hn, cn) = lstm_effect_model_pallas_train(
            params, x, latent, st, interpret=True
        )
        return jnp.mean(y**2) + jnp.mean(hn**2) + jnp.mean(cn**2)

    g_ref = jax.grad(loss_scan)(h0)
    g_pal = jax.grad(loss_pal)(h0)
    for a, r in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-6
        )


def test_pallas_lstm_multi_tile_batch(rng):
    """Batch > 128 lanes: two grid tiles, per-tile state isolation."""
    b, t, hid = 140, 200, 16
    model, params, x, latent = _setup(rng, b, t, hid)
    h0 = lstm_init_state(b, hid)
    y_ref, (h_ref, _) = model.apply(params, x, latent, h0)
    y, (h, _) = lstm_effect_model_pallas(
        params, x, latent, h0, t_chunk=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=2e-6)


def test_pallas_lstm_train_grads_match_autodiff_h160(rng):
    """hid > 64 shrinks the training time-chunk (_train_t_chunk) so the
    saved-state VMEM blocks stay inside the proven 64*64 working set —
    the round-4 LSTM-160 capacity bracket's compile-time VMEM overrun.
    Parity of y + all grads at hid=160 across chunk boundaries."""
    from mod_extraction_tpu.ops.pallas_lstm import (
        _train_t_chunk,
        lstm_effect_model_pallas_train,
    )

    assert _train_t_chunk(160, 10_000) == 24  # 64*64/160 -> 25.6 -> 24
    assert _train_t_chunk(64, 10_000) == 64   # shipped size unchanged
    assert _train_t_chunk(1024, 10_000) == 8  # floor

    b, t, hid = 2, 100, 160  # several 24-step chunks + padding
    model, params, x, latent = _setup(rng, b, t, hid)
    h0 = lstm_init_state(b, hid)
    tgt = jnp.asarray(rng.standard_normal((b, 1, t)).astype(np.float32))

    def loss_scan(p, x, lat):
        y, _ = model.apply(p, x, lat, h0)
        return jnp.mean((y - tgt) ** 2)

    def loss_pal(p, x, lat):
        y, _ = lstm_effect_model_pallas_train(p, x, lat, h0, interpret=True)
        return jnp.mean((y - tgt) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_scan, argnums=(0, 1, 2))(
        params, x, latent
    )
    l_pal, g_pal = jax.value_and_grad(loss_pal, argnums=(0, 1, 2))(
        params, x, latent
    )
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-5)
    for a, r in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-6
        )
