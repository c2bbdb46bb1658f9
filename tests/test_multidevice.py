"""Data-parallel sharding over the 8-device virtual CPU mesh (the
driver's `dryrun_multichip` contract, kept in CI): full train steps for
both tasks with the batch sharded and params replicated."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mod_extraction_tpu.data.synthetic import make_synthetic_batch
from mod_extraction_tpu.models import LSTMEffectModel, Spectral2DCNN
from mod_extraction_tpu.parallel.mesh import make_mesh, shard_batch
from mod_extraction_tpu.train.lfo_task import LFOExtractionTask
from mod_extraction_tpu.train.render import RenderConfig
from mod_extraction_tpu.train.tbptt_task import TBPTTEffectModelingTask

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)

SR, N = 8000.0, 4000


def _cfg():
    return RenderConfig(sr=SR, n_samples=N, effects=(1, 2, 3), max_delay_samples=89)


def test_lfo_train_step_sharded_8dev():
    mesh = make_mesh(8)
    model = Spectral2DCNN(
        in_ch=2, n_samples=N, sr=SR, n_fft=256, hop_len=64, n_mels=32,
        out_channels=(8, 8), bin_dilations=(1, 1), temp_dilations=(1, 2),
        pool_size=(2, 1),
    )
    task = LFOExtractionTask(model=model, render_cfg=_cfg())
    key = jax.random.PRNGKey(0)
    batch = make_synthetic_batch(0, 16, N, SR, "flanger")
    with jax.sharding.set_mesh(mesh):
        state = task.init_state(key)
        state, metrics = task.train_step(state, shard_batch(batch, mesh), key)
    assert np.isfinite(float(metrics["loss"]))


def test_lfo_sharded_matches_single_device():
    """DP invariance (reference DDP semantics, `cli.py:48`): the same
    global batch through the 8-way-sharded step must reproduce the
    1-device step's loss and updated params to fp tolerance."""
    model = Spectral2DCNN(
        in_ch=2, n_samples=N, sr=SR, n_fft=256, hop_len=64, n_mels=32,
        out_channels=(8, 8), bin_dilations=(1, 1), temp_dilations=(1, 2),
        pool_size=(2, 1),
    )
    task = LFOExtractionTask(model=model, render_cfg=_cfg())
    key = jax.random.PRNGKey(0)
    batch = make_synthetic_batch(0, 16, N, SR, "flanger")
    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        with jax.sharding.set_mesh(mesh):
            state = task.init_state(key)
            state, metrics = task.train_step(state, shard_batch(batch, mesh), key)
        results[n_dev] = (jax.device_get(state.params), float(metrics["loss"]))
    assert results[1][1] == pytest.approx(results[8][1], abs=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(results[1][0])
    flat8 = dict(jax.tree_util.tree_leaves_with_path(results[8][0]))
    for path, leaf1 in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf1), np.asarray(flat8[path]),
            atol=2e-5, rtol=1e-4, err_msg=str(path),
        )


def test_tbptt_sharded_matches_single_device():
    """Same DP invariance for the TBPTT task (85-update scan in the full
    config; a few updates here) — params after the step must match."""
    task = TBPTTEffectModelingTask(
        effect_model=LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=8, latent_dim=1),
        render_cfg=_cfg(), warmup_n_samples=256, step_n_samples=256,
        lfo_model=None, model_smooth_n_frames=8, should_stretch=True,
    )
    key = jax.random.PRNGKey(0)
    batch = make_synthetic_batch(0, 16, N, SR, "flanger")
    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        with jax.sharding.set_mesh(mesh):
            state = task.init_state(key)
            state, metrics = task.train_step(state, shard_batch(batch, mesh), key)
        results[n_dev] = (jax.device_get(state.params), float(metrics["loss"]))
    # TBPTT chains many sequential updates, so fp divergence compounds a
    # little more than the single-update task — still tight
    assert results[1][1] == pytest.approx(results[8][1], abs=5e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(results[1][0])
    flat8 = dict(jax.tree_util.tree_leaves_with_path(results[8][0]))
    for path, leaf1 in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf1), np.asarray(flat8[path]),
            atol=5e-5, rtol=5e-4, err_msg=str(path),
        )


def test_tbptt_train_step_sharded_8dev():
    mesh = make_mesh(8)
    task = TBPTTEffectModelingTask(
        effect_model=LSTMEffectModel(in_ch=1, out_ch=1, n_hidden=8, latent_dim=1),
        render_cfg=_cfg(), warmup_n_samples=256, step_n_samples=256,
        lfo_model=None, model_smooth_n_frames=8, should_stretch=True,
    )
    key = jax.random.PRNGKey(0)
    batch = make_synthetic_batch(0, 16, N, SR, "flanger")
    with jax.sharding.set_mesh(mesh):
        state = task.init_state(key)
        state, metrics = task.train_step(state, shard_batch(batch, mesh), key)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["valid_fraction"]) <= 1.0
