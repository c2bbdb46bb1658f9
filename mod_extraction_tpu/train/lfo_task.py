"""LFO-extraction task: on-device render -> extractor -> losses -> AdamW.

TPU-native re-design of the reference's `LFOExtraction` LightningModule
(`mod_extraction/lightning.py:65-199`).  The whole step — effect
rendering, Mel frontend, CNN forward/backward, optimizer update, metric
reduction — is ONE jitted SPMD program over the data mesh.

Step semantics (parity with `common_step`, `lightning.py:96-158`):
* model input = cat(dry, wet) when use_dry else wet
* GT mod_sig linearly resampled (align_corners=True) to the model's frame
  count
* optional output smoothing (unfold-mean) with center-crop of the target
* optional `stretch_corners` post-processing
* weighted loss dict with zero-weight metrics still logged
* `sub_batch_size` microbatching (`lightning.py:160-185`) via lax.map
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mod_extraction_tpu.losses import WeightedLossDict
from mod_extraction_tpu.models.random_lfo import RandomLFO
from mod_extraction_tpu.ops.corners import smoothen, stretch_corners
from mod_extraction_tpu.train.render import RenderConfig, render_batch
from mod_extraction_tpu.utils.interp import linear_interpolate_last_dim


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def center_crop_last(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """reference `center_crop_mod_sig` (`lightning.py:86-94`)."""
    if x.shape[-1] == size:
        return x
    padding = x.shape[-1] - size
    pad_l = padding // 2
    pad_r = padding - pad_l
    return x[..., pad_l : x.shape[-1] - pad_r]


@dataclass(eq=False)  # identity hash: task instances are static jit args
class LFOExtractionTask:
    """Builds jitted train/val steps for an LFO-extractor model."""

    model: Any  # flax module, or RandomLFO for the baseline
    render_cfg: RenderConfig
    optimizer: Optional[optax.GradientTransformation] = None
    use_dry: bool = True
    model_smooth_n_frames: int = 4
    should_stretch: bool = False
    max_n_corners: int = 16
    stretch_smooth_n_frames: int = 0
    sub_batch_size: Optional[int] = None
    loss_dict: Optional[Dict[str, float]] = None

    def __post_init__(self):
        self.losses = WeightedLossDict(self.loss_dict)
        if self.optimizer is None:
            # reference default: AdamW lr 1e-4, betas (0.8, 0.99)
            # (`configs/opt/adam_w.yml`)
            self.optimizer = optax.adamw(1e-4, b1=0.8, b2=0.99)
        self.is_random_lfo = isinstance(self.model, RandomLFO)
        # the RandomLFO baseline is the only task with NO trainable params
        self.has_params = not self.is_random_lfo

    # ---------------------------------------------------------------- init
    def init_state(self, key: jax.Array, batch_size: int = 2) -> TrainState:
        assert not self.is_random_lfo, "RandomLFO baseline has no params"
        in_ch = 2 if self.use_dry else 1
        x = jnp.zeros((batch_size, in_ch, self.render_cfg.n_samples))
        params = self.model.init(key, x)
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------- forward
    def _extract(self, params, dry, wet, fx, key, train: bool):
        if self.is_random_lfo:
            mod_hat = self.model(
                key,
                wet.shape[0],
                {
                    "shape": fx["shape"],
                    "phase": fx["phase"],
                    "rate_hz": fx["rate_hz"],
                },
            )
            return mod_hat[:, 0, :], None
        model_in = jnp.concatenate([dry, wet], axis=1) if self.use_dry else wet
        mod_hat, latent = self.model.apply(
            params, model_in, train=train, mask_key=key if train else None
        )
        return mod_hat[:, 0, :], latent

    def _postprocess(self, mod_hat, mod_gt):
        """smooth + stretch + target cropping (`lightning.py:114-128`)."""
        mod_gt = linear_interpolate_last_dim(mod_gt, mod_hat.shape[-1])
        if self.model_smooth_n_frames > 1:
            mod_hat = smoothen(mod_hat, self.model_smooth_n_frames)
            mod_gt = center_crop_last(mod_gt, mod_hat.shape[-1])
        if self.should_stretch:
            mod_hat = stretch_corners(
                mod_hat,
                max_n_corners=self.max_n_corners,
                smooth_n_frames=self.stretch_smooth_n_frames,
            )
            if self.stretch_smooth_n_frames > 1:
                mod_gt = center_crop_last(mod_gt, mod_hat.shape[-1])
        return mod_hat, mod_gt

    def _loss_fn(self, params, batch, key, train: bool, corpus=None):
        k_render, k_mask, k_rand = jax.random.split(key, 3)
        dry, wet, mod_frames, fx = render_batch(batch, self.render_cfg, corpus)
        mod_hat, _ = self._extract(params, dry, wet, fx, k_mask, train)
        mod_hat, mod_gt = self._postprocess(mod_hat, mod_frames)
        loss, metrics = self.losses(mod_hat, mod_gt)
        return loss, metrics

    # --------------------------------------------------------------- steps
    # `corpus` is an ORDINARY (traced) argument, not trace-time-captured
    # state: evaluating several corpora through one compiled step (e.g.
    # validate_many sweeps) must read the corpus passed at call time
    def train_step_impl(
        self, state: TrainState, batch, key, corpus=None
    ) -> Tuple[TrainState, Dict]:
        """Undecorated step body, shared by `train_step` (one jitted step)
        and `train_steps` (a jitted scan of steps per dispatch)."""
        if self.sub_batch_size is not None:
            return self._train_step_subbatched(state, batch, key, corpus)

        def loss_fn(params):
            return self._loss_fn(params, batch, key, train=True, corpus=corpus)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, metrics

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(
        self, state: TrainState, batch, key, corpus=None
    ) -> Tuple[TrainState, Dict]:
        return self.train_step_impl(state, batch, key, corpus)

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_steps(
        self, state: TrainState, batches, keys, corpus=None
    ) -> Tuple[TrainState, Dict]:
        """Run several optimizer steps in ONE dispatched program.

        `batches` is the per-step batch pytree stacked on a leading axis,
        `keys` the matching (n, 2) step keys.  Scanning the update on
        device amortizes per-step dispatch cost (neutral at batch 128 on
        an idle tunnel where async dispatch hides the round trip; it
        matters in dispatch-bound regimes — small batches, busy hosts).
        Returns the final state and the per-step metrics stacked on a
        leading axis (so the caller can still log every step).
        """

        def body(st, inp):
            b, k = inp
            return self.train_step_impl(st, b, k, corpus)

        return jax.lax.scan(body, state, (batches, keys))

    def _train_step_subbatched(self, state, batch, key, corpus=None):
        """`sub_batch_size` microbatching with gradient averaging."""
        sub = self.sub_batch_size
        b = jax.tree.leaves(batch)[0].shape[0]
        assert b % sub == 0 and b >= sub
        n = b // sub

        def reshape(x):
            return x.reshape((n, sub) + x.shape[1:])

        sub_batches = jax.tree.map(reshape, batch)
        keys = jax.random.split(key, n)

        def one(params, sb, k):
            return self._loss_fn(params, sb, k, train=True, corpus=corpus)

        def grad_one(carry, inp):
            sb, k = inp
            (loss, metrics), grads = jax.value_and_grad(one, has_aux=True)(
                state.params, sb, k
            )
            g_acc, m_acc = carry
            g_acc = jax.tree.map(jnp.add, g_acc, grads)
            m_acc = jax.tree.map(jnp.add, m_acc, metrics)
            return (g_acc, m_acc), None

        zeros_g = jax.tree.map(jnp.zeros_like, state.params)
        metrics_shape = jax.eval_shape(
            lambda p, sb, k: one(p, sb, k)[1],
            state.params,
            jax.tree.map(lambda x: x[0], sub_batches),
            keys[0],
        )
        zeros_m = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape
        )
        (g_sum, m_sum), _ = jax.lax.scan(
            grad_one, (zeros_g, zeros_m), (sub_batches, keys)
        )
        grads = jax.tree.map(lambda g: g / n, g_sum)
        metrics = jax.tree.map(lambda m: m / n, m_sum)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    @partial(jax.jit, static_argnums=(0,))
    def val_step(self, params, batch, key, corpus=None) -> Dict:
        _, metrics = self._loss_fn(params, batch, key, train=False, corpus=corpus)
        return metrics
