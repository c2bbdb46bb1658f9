"""TBPTT task variants beyond the shipped frozen-extractor config:
clip-level param_model conditioning (`lightning.py:343-347,371-375`) and
the unfrozen-extractor path (`lightning.py:361-365`).  Tiny shapes, CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mod_extraction_tpu.data.synthetic import make_synthetic_batch
from mod_extraction_tpu.models import LSTMEffectModel, Spectral2DCNN
from mod_extraction_tpu.models.tcn import SpectralDSTCN
from mod_extraction_tpu.train.render import RenderConfig
from mod_extraction_tpu.train.tbptt_task import TBPTTEffectModelingTask

SR, N = 8000.0, 4000


def _render_cfg():
    return RenderConfig(sr=SR, n_samples=N, effects=(2,), max_delay_samples=89)


def _batch(bs=4):
    return jax.tree.map(
        jnp.asarray, make_synthetic_batch(0, bs, N, SR, "flanger")
    )


def _tiny_extractor():
    return Spectral2DCNN(
        in_ch=2, n_samples=N, sr=SR, n_fft=256, hop_len=64, n_mels=16,
        out_channels=(4, 4), bin_dilations=(1, 1), temp_dilations=(1, 2),
        pool_size=(2, 1),
    )


def test_param_model_conditioning():
    em = LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=8, latent_dim=3)
    pm = SpectralDSTCN(
        n_samples=N, n_fft=256, hop_len=64, kernel_size=5,
        out_channels=(4, 4), dilations=(1, 2), strides=(2, 2),
        n_fc_units=8, latent_dim=2,
    )
    task = TBPTTEffectModelingTask(
        effect_model=em, render_cfg=_render_cfg(),
        warmup_n_samples=256, step_n_samples=256,
        lfo_model=None, param_model=pm, model_smooth_n_frames=0,
        should_stretch=False, discard_invalid_lfos=False,
    )
    key = jax.random.PRNGKey(0)
    state = task.init_state(key)
    assert set(state.params.keys()) == {"effect", "param"}
    before = jax.tree.map(lambda x: np.array(x), state.params)  # donated below
    state2, metrics = task.train_step(state, _batch(), key)
    assert np.isfinite(float(metrics["loss"]))
    # param model actually received gradient updates
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        before["param"], state2.params["param"],
    )
    assert max(jax.tree.leaves(diff)) > 0
    m = task.val_step(state2.params, _batch(), key)
    assert np.isfinite(float(m["loss"]))


def test_unfrozen_lfo_model_gets_gradients():
    em = LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=8, latent_dim=1)
    task = TBPTTEffectModelingTask(
        effect_model=em, render_cfg=_render_cfg(),
        warmup_n_samples=256, step_n_samples=256,
        lfo_model=_tiny_extractor(), lfo_params=None,
        freeze_lfo_model=False, model_smooth_n_frames=0,
        should_stretch=False, discard_invalid_lfos=False,
    )
    key = jax.random.PRNGKey(0)
    state = task.init_state(key)
    assert set(state.params.keys()) == {"effect", "lfo"}
    before = jax.tree.map(lambda x: np.array(x), state.params)  # donated below
    state2, metrics = task.train_step(state, _batch(2), key)
    assert np.isfinite(float(metrics["loss"]))
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        before["lfo"], state2.params["lfo"],
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_frozen_path_keeps_flat_params():
    em = LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=8, latent_dim=1)
    task = TBPTTEffectModelingTask(
        effect_model=em, render_cfg=_render_cfg(),
        warmup_n_samples=256, step_n_samples=256, lfo_model=None,
        model_smooth_n_frames=0, should_stretch=False,
        discard_invalid_lfos=False,
    )
    state = task.init_state(jax.random.PRNGKey(0))
    # shipped-config layout: plain flax params, no {"effect": ...} wrapper
    assert "params" in state.params


def test_schedule_advances_per_inner_update():
    """An lr schedule must see one optimizer update per TBPTT chunk
    (the reference steps its optimizer per 1024-sample chunk,
    `lightning.py:356-384`) — (n_samples - warmup) // step chunks per
    batch, NOT one per batch."""
    import optax

    seen = []

    def schedule(count):
        seen.append(True)
        return 1e-4 * jnp.ones_like(count, dtype=jnp.float32)

    em = LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=8, latent_dim=1)
    task = TBPTTEffectModelingTask(
        effect_model=em, render_cfg=_render_cfg(),
        warmup_n_samples=256, step_n_samples=256,
        lfo_model=None, model_smooth_n_frames=0,
        should_stretch=False, discard_invalid_lfos=False,
        optimizer=optax.adamw(schedule, b1=0.8, b2=0.99),
    )
    key = jax.random.PRNGKey(0)
    state = task.init_state(key)

    def count_of(opt_state):
        leaves = [
            l for l in jax.tree.leaves(opt_state)
            if hasattr(l, "dtype") and l.dtype == jnp.int32 and l.ndim == 0
        ]
        assert leaves, "no int32 scalar count in opt_state"
        return max(int(l) for l in leaves)

    assert count_of(state.opt_state) == 0
    state2, _ = task.train_step(state, _batch(2), key)
    n_chunks = (N - 256) // 256
    assert task.updates_per_batch == n_chunks
    assert count_of(state2.opt_state) == n_chunks
    state3, _ = task.train_step(state2, _batch(2), key)
    assert count_of(state3.opt_state) == 2 * n_chunks
