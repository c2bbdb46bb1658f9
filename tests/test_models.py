"""Model-layer tests: torch-parity of primitives (conv/LN/pool/PReLU,
LSTM), shape contracts, and streaming equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from mod_extraction_tpu.models.common import (
    layer_norm_no_affine,
    max_pool_floor,
    same_pads,
)
from mod_extraction_tpu.models.lstm import LSTMEffectModel, lstm_init_state
from mod_extraction_tpu.models.spectral_2dcnn import Spectral2DCNN
from mod_extraction_tpu.models.tcn import TCN
from mod_extraction_tpu.models.torch_port import (
    conv2d_kernel,
    port_lstm_effect_model,
)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 3, 8, 10)).astype(np.float32)  # (B,C,bins,frames)
    ln = tnn.LayerNorm([8, 10], elementwise_affine=False)
    ref = ln(torch.from_numpy(x)).detach().numpy()
    # ours is channel-last over (bins, frames)
    ours = layer_norm_no_affine(jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), (1, 2))
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conv2d_same_dilated_matches_torch(rng):
    x = rng.standard_normal((2, 3, 16, 40)).astype(np.float32)
    conv = tnn.Conv2d(3, 5, (5, 13), dilation=(1, 4), padding="same")
    ref = conv(torch.from_numpy(x)).detach().numpy()

    from flax import linen as nn

    pad_b, pad_t = same_pads(5, 1), same_pads(13, 4)
    mod = nn.Conv(5, kernel_size=(5, 13), kernel_dilation=(1, 4), padding=(pad_b, pad_t))
    params = {
        "params": {
            "kernel": jnp.asarray(conv2d_kernel(conv.weight.detach().numpy())),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }
    }
    xl = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    # XLA CPU's default-precision conv accumulates loosely (~5e-3 abs);
    # pin highest precision for the parity check.
    with jax.default_matmul_precision("highest"):
        out = mod.apply(params, xl)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_max_pool_floor_matches_torch(rng):
    x = rng.standard_normal((2, 4, 15, 11)).astype(np.float32)
    ref = tnn.MaxPool2d((2, 1))(torch.from_numpy(x)).numpy()
    ours = max_pool_floor(jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), (2, 1))
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_lstm_effect_model_matches_torch(rng):
    """Port torch LSTM+Linear weights; compare the full effect model:
    cat(latent, x) -> LSTM -> fc -> +x -> tanh (models.py:325-339)."""
    b, t, hid = 2, 50, 8
    x = (0.1 * rng.standard_normal((b, 1, t))).astype(np.float32)
    lat = rng.standard_normal((b, 1, t)).astype(np.float32)

    tl = tnn.LSTM(2, hid, batch_first=True)
    fc = tnn.Linear(hid, 1)
    inp = torch.from_numpy(np.concatenate([lat, x], 1)).swapaxes(1, 2)
    with torch.no_grad():
        out, (h, c) = tl(inp)
        ref = torch.tanh(fc(out).swapaxes(1, 2) + torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    sd = {f"lstm.{k}": v for k, v in sd.items()}
    sd["fc.weight"] = fc.weight.detach().numpy()
    sd["fc.bias"] = fc.bias.detach().numpy()
    params = {"params": jax.tree.map(jnp.asarray, port_lstm_effect_model(sd))}

    model = LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=hid, latent_dim=1)
    y, (hj, cj) = model.apply(params, jnp.asarray(x), jnp.asarray(lat),
                              lstm_init_state(b, hid))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hj), h[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cj), c[0].numpy(), atol=1e-5)


def test_lstm_streaming_equals_full(rng):
    """Chunked inference with carried state == full-sequence inference."""
    b, t, hid = 2, 64, 8
    x = rng.standard_normal((b, 1, t)).astype(np.float32)
    lat = rng.standard_normal((b, 1, t)).astype(np.float32)
    model = LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=hid, latent_dim=1)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lat),
                        lstm_init_state(b, hid))
    full, _ = model.apply(params, jnp.asarray(x), jnp.asarray(lat),
                          lstm_init_state(b, hid))
    state = lstm_init_state(b, hid)
    chunks = []
    for s in range(0, t, 16):
        y, state = model.apply(
            params, jnp.asarray(x[:, :, s : s + 16]),
            jnp.asarray(lat[:, :, s : s + 16]), state,
        )
        chunks.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(chunks, -1), np.asarray(full), atol=1e-5)


def test_spectral_2dcnn_shapes():
    model = Spectral2DCNN(
        in_ch=2, n_samples=8192, sr=8000, n_fft=256, hop_len=64, n_mels=32,
        kernel_size=(5, 13), out_channels=[8, 8], bin_dilations=[1, 1],
        temp_dilations=[1, 2], pool_size=(2, 1), latent_dim=1,
        freq_mask_amount=0.25, time_mask_amount=0.25,
    )
    x = jnp.zeros((3, 2, 8192))
    params = model.init(jax.random.PRNGKey(0), x)
    n_frames = 8192 // 64 + 1
    mod, latent = model.apply(params, x)
    assert mod.shape == (3, 1, n_frames)
    assert latent.shape == (3, 8, n_frames)
    # train path with masking key works and keeps shapes
    mod_t, _ = model.apply(
        params, x, train=True, mask_key=jax.random.PRNGKey(1)
    )
    assert mod_t.shape == mod.shape
    assert np.all(np.asarray(mod) >= 0) and np.all(np.asarray(mod) <= 1)


def test_tcn_causal_cached_streaming(rng):
    """Cached streaming TCN: chunked == full (with left zero-pad init)."""
    t = 128
    x = rng.standard_normal((1, 1, t)).astype(np.float32)
    tcn = TCN(out_channels=[4, 4], dilations=[1, 2], in_ch=1, kernel_size=3,
              is_causal=True, is_cached=True)
    xs = jnp.asarray(x)
    params = tcn.init(jax.random.PRNGKey(0), xs)
    full, _ = tcn.apply(params, xs)
    state = None
    outs = []
    for s in range(0, t, 32):
        y, state = tcn.apply(params, xs[:, :, s : s + 32], stream_state=state)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(outs, -1), np.asarray(full), atol=1e-5
    )


def test_tcn_receptive_field():
    tcn = TCN(out_channels=[8] * 5, dilations=[2**i for i in range(5)],
              kernel_size=13, padding=None, is_causal=False)
    # rf = 13 + 12*(2+4+8+16) = 373
    assert tcn.calc_receptive_field() == 13 + 12 * (2 + 4 + 8 + 16)


def test_max_pool_bwd_impls_match():
    """The eq-mask custom-VJP pool backward (TPU fast path) must equal
    the SelectAndScatter transpose on tie-free inputs, and duplicate the
    cotangent across exact ties (the documented deviation)."""
    import jax
    import jax.numpy as jnp

    from mod_extraction_tpu.models.common import max_pool_floor

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 3)), jnp.float32)

    def loss(x, impl):
        y = max_pool_floor(x, (2, 1), bwd_impl=impl)
        return jnp.sum(y * y * 0.5)

    g_eq = jax.grad(lambda a: loss(a, "eq_mask"))(x)
    g_ss = jax.grad(lambda a: loss(a, "select_scatter"))(x)
    np.testing.assert_allclose(np.asarray(g_eq), np.asarray(g_ss), atol=1e-6)

    # tie: both window elements equal -> eq-mask routes to both
    xt = jnp.ones((1, 2, 1, 1), jnp.float32)
    gt = jax.grad(lambda a: jnp.sum(max_pool_floor(a, (2, 1))))(xt)
    np.testing.assert_allclose(np.asarray(gt).ravel(), [1.0, 1.0])


def _act_io_model(rng, **kw):
    model = Spectral2DCNN(
        in_ch=2, n_samples=8192, sr=8000, n_fft=256, hop_len=64, n_mels=32,
        kernel_size=(5, 13), out_channels=[8, 8], bin_dilations=[1, 1],
        temp_dilations=[1, 2], pool_size=(2, 1), latent_dim=1, **kw,
    )
    x = jnp.asarray(rng.standard_normal((2, 2, 8192)).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def test_act_io_compute_is_noop_in_f32(rng):
    """act_io_dtype="compute" with a float32 trunk only changes
    1/sqrt -> rsqrt in the LN normalize — outputs must agree to ulp-level
    tolerance, and params are identical (the knob adds no parameters)."""
    m_a, p_a, x = _act_io_model(rng, compute_dtype="float32",
                                act_io_dtype="float32")
    m_b, p_b, _ = _act_io_model(rng, compute_dtype="float32",
                                act_io_dtype="compute")
    assert jax.tree.structure(p_a) == jax.tree.structure(p_b)
    y_a, _ = m_a.apply(p_a, x)
    y_b, _ = m_b.apply(p_a, x)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b),
                               rtol=1e-5, atol=1e-6)


def test_act_io_compute_bf16_close_and_trainable(rng):
    """bf16 activation I/O (the HBM-traffic knob): forward stays within a
    bf16-rounding band of the legacy f32-LN path, and grads are finite."""
    m_a, p_a, x = _act_io_model(rng, compute_dtype="bfloat16",
                                act_io_dtype="float32")
    m_b, _, _ = _act_io_model(rng, compute_dtype="bfloat16",
                              act_io_dtype="compute")
    y_a, _ = m_a.apply(p_a, x)
    y_b, _ = m_b.apply(p_a, x)
    # sigmoid outputs in [0,1]: absolute band ~ bf16 resolution of the
    # pre-sigmoid logits
    assert float(jnp.max(jnp.abs(y_a - y_b))) < 5e-2

    def loss(p):
        y, _ = m_b.apply(p, x)
        return jnp.mean(y.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(p_a)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)
