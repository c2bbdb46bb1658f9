"""TBPTT effect-model training (conditional LSTM on a frozen extractor).

TPU-native re-design of `TBPTTLFOEffectModeling`
(`mod_extraction/lightning.py:202-431`).  The reference runs a manual-
optimization Python loop: per 1024-sample chunk it does forward, loss,
backward, optimizer step, hidden detach (85 updates per 2 s batch,
`lightning.py:356-384`).  Here the ENTIRE loop is a `lax.scan` whose
carry is (params, opt_state, hidden) — one jitted SPMD program per batch,
with XLA inserting one gradient all-reduce per chunk over ICI.

Semantic parity notes:
* extractor output is smoothed (unfold-mean 8), corner-stretched, and the
  audio is centre-cropped proportionally (`lightning.py:284-323`);
* invalid LFOs: the reference DROPS examples (dynamic shapes,
  `lightning.py:325-335`); we zero-WEIGHT them in every loss instead
  (masked means) — identical gradients per surviving example up to the
  batch-mean normalization (documented deviation);
* warmup chunk runs before the update loop and is excluded from outputs
  (`lightning.py:340-353, 389-393`);
* hidden detach == the scan carry holding `stop_gradient`-ed state.
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
from mod_extraction_tpu.models.lstm import LSTMEffectModel, lstm_init_state
from mod_extraction_tpu.models.random_lfo import RandomLFO
from mod_extraction_tpu.ops.corners import (
    find_valid_mod_sig_mask,
    smoothen,
    stretch_corners,
)
from mod_extraction_tpu.train.lfo_task import center_crop_last
from mod_extraction_tpu.train.render import RenderConfig, render_batch
from mod_extraction_tpu.utils.interp import linear_interpolate_last_dim


class TBPTTState(struct.PyTreeNode):
    # Effect-model params when only the effect model trains (the shipped
    # configs); a {"effect", "param"?, "lfo"?} dict when a param_model is
    # attached or the extractor is unfrozen (`lightning.py:343-347,361-365`).
    params: Any
    opt_state: Any
    step: jnp.ndarray


@dataclass(eq=False)  # identity hash: task instances are static jit args
class TBPTTEffectModelingTask:
    effect_model: LSTMEffectModel
    render_cfg: RenderConfig
    warmup_n_samples: int = 1024
    step_n_samples: int = 1024
    lfo_model: Any = None  # flax extractor, RandomLFO, or None (GT mod sig)
    lfo_params: Any = None  # extractor params (starting point if unfrozen)
    freeze_lfo_model: bool = True
    param_model: Any = None  # clip-level latent model (SpectralDSTCN)
    optimizer: Optional[optax.GradientTransformation] = None
    use_dry: bool = True
    model_smooth_n_frames: int = 8
    should_stretch: bool = True
    max_n_corners: int = 16
    stretch_smooth_n_frames: int = 0
    discard_invalid_lfos: bool = True
    loss_dict: Optional[Dict[str, float]] = None
    # LSTM implementation for NO-GRAD forwards (warmup, full-sequence
    # val): "auto" uses the fused Pallas kernel on TPU.  Gradient chunks
    # always use the scan (autodiff applies there).
    lstm_impl: str = "auto"

    def __post_init__(self):
        if self.loss_dict is None:
            self.loss_dict = {"l1": 1.0, "esr": 0.0, "dc": 0.0}
        self.losses = WeightedLossDict(self.loss_dict)
        if self.optimizer is None:
            self.optimizer = optax.adamw(1e-4, b1=0.8, b2=0.99)
        self.use_gt_mod_sig = self.lfo_model is None
        self.is_random_lfo = isinstance(self.lfo_model, RandomLFO)
        # NB: is_random_lfo refers to the LFO MODEL; the effect model
        # always trains, so a TBPTT task always has params
        self.has_params = True
        self.trainable_lfo = (
            self.lfo_model is not None
            and not self.freeze_lfo_model
            and not self.is_random_lfo
        )
        # multi-component param pytree only when something besides the
        # effect model trains (keeps shipped-config ckpt layout stable)
        self.multi_params = self.param_model is not None or self.trainable_lfo
        if self.param_model is not None and hasattr(self.param_model, "n_samples"):
            # the param model sees the centre-CROPPED wet signal; fix up
            # its static length so LayerNorm temporal dims line up
            n = self._cropped_n_samples()
            if self.param_model.n_samples != n:
                self.param_model = self.param_model.clone(n_samples=n)

    # ---------------------------------------------------------------- init
    def init_state(self, key: jax.Array) -> TBPTTState:
        b, t = 2, self.warmup_n_samples
        em = self.effect_model
        k_eff, k_param, k_lfo = jax.random.split(key, 3)
        params = em.init(
            k_eff,
            jnp.zeros((b, em.in_ch, t)),
            jnp.zeros((b, em.latent_dim, t)),
            lstm_init_state(b, em.n_hidden),
        )
        if self.multi_params:
            params = {"effect": params}
            if self.param_model is not None:
                params["param"] = self.param_model.init(
                    k_param, jnp.zeros((b, 1, self._cropped_n_samples()))
                )
            if self.trainable_lfo:
                lfo_p = self.lfo_params
                if lfo_p is None:
                    in_ch = 2 if self.use_dry else 1
                    lfo_p = self.lfo_model.init(
                        k_lfo, jnp.zeros((b, in_ch, self.render_cfg.n_samples))
                    )
                params["lfo"] = lfo_p
        return TBPTTState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def _cropped_n_samples(self) -> int:
        """Static audio length after the proportional centre-crop that
        follows mod-sig smoothing (`lightning.py:320-323`)."""
        t = self.render_cfg.n_samples
        n_frames = self.render_cfg.n_mod_frames
        if self.use_gt_mod_sig or self.is_random_lfo:
            n_hat = n_frames
        else:
            n_hat = self.render_cfg.n_samples // 256 + 1  # extractor frames
        removed = max(0, self.model_smooth_n_frames - 1)
        if self.stretch_smooth_n_frames > 1 and self.should_stretch:
            removed += self.stretch_smooth_n_frames - 1
        n_after = n_hat - removed
        return int((n_after / n_hat) * t)

    @property
    def updates_per_batch(self) -> int:
        """Optimizer updates per batch — the chunk-scan length train_step
        runs (its `n_chunks` on the static post-crop audio length).  The
        source of truth for sizing lr_schedule decay_steps and for the
        step log's schedule-position display."""
        return max(
            (self._cropped_n_samples() - self.warmup_n_samples)
            // self.step_n_samples,
            1,
        )

    def _effect_params(self, params):
        return params["effect"] if self.multi_params else params

    def _use_pallas_lstm(self) -> bool:
        if self.lstm_impl == "pallas":
            # Same hid cap as the auto path (see below): explicit
            # "pallas" must not opt a hid>256 config into a kernel
            # regime with no grad-parity coverage.
            n_hid = getattr(self.effect_model, "n_hidden", 64)
            if n_hid > 256:
                raise ValueError(
                    f"lstm_impl='pallas' requires n_hidden<=256 (got "
                    f"{n_hid}); the training kernels' VMEM tiling is "
                    "only validated to 256 — use lstm_impl='scan'."
                )
            return jax.default_backend() == "tpu"
        if self.lstm_impl != "auto":
            return False
        # auto: the training kernels adapt their time-chunk to the
        # hidden size (ops/pallas_lstm.py::_train_t_chunk) so the
        # saved-state VMEM blocks stay inside the scoped stack; the
        # remaining hid-scaling residents are the (4H, H) weight +
        # accumulator blocks, comfortably resident through hid=256.
        # Beyond that, fall back to the lax.scan path.
        return (
            jax.default_backend() == "tpu"
            and getattr(self.effect_model, "n_hidden", 64) <= 256
        )

    def _em_forward_nograd(self, eff_params, x, latent, state):
        """Effect-model forward on a no-grad path; fused Pallas kernel on
        TPU, flax scan elsewhere."""
        if self._use_pallas_lstm():
            from mod_extraction_tpu.ops.pallas_lstm import (
                lstm_effect_model_pallas,
            )

            return lstm_effect_model_pallas(eff_params, x, latent, state)
        return self.effect_model.apply(eff_params, x, latent, state)

    def _em_forward_grad(self, eff_params, x, latent, state):
        """Effect-model forward inside the chunk loss (the TBPTT hot
        loop): the custom-VJP Pallas kernel pair on TPU, scan elsewhere."""
        if self._use_pallas_lstm():
            from mod_extraction_tpu.ops.pallas_lstm import (
                lstm_effect_model_pallas_train,
            )

            return lstm_effect_model_pallas_train(eff_params, x, latent, state)
        return self.effect_model.apply(eff_params, x, latent, state)

    # ----------------------------------------------------------- mod sig
    def _extract_mod_sig(self, dry, wet, mod_frames, fx, key, lfo_params=None):
        """Extractor forward — `lightning.py:254-272`.  Gradients flow only
        when `lfo_params` is passed explicitly (unfrozen path,
        `lightning.py:361-365`); otherwise stop_gradient == torch no_grad."""
        if self.use_gt_mod_sig:
            return mod_frames, mod_frames
        if self.is_random_lfo:
            mod_hat = self.lfo_model(key, wet.shape[0], fx)[:, 0, :]
            mod = linear_interpolate_last_dim(mod_frames, mod_hat.shape[-1])
            return mod_hat, mod
        model_in = jnp.concatenate([dry, wet], axis=1) if self.use_dry else wet
        p = lfo_params if lfo_params is not None else self.lfo_params
        mod_hat, _ = self.lfo_model.apply(p, model_in)
        mod_hat = mod_hat[:, 0, :]
        if lfo_params is None:
            mod_hat = jax.lax.stop_gradient(mod_hat)
        mod = linear_interpolate_last_dim(mod_frames, mod_hat.shape[-1])
        return mod_hat, mod

    def _smooth_stretch(self, mod_hat, mod):
        """`smooth_stretch_crop_mod_sig` (`lightning.py:284-300`)."""
        orig = mod_hat.shape[-1]
        if self.model_smooth_n_frames > 1:
            mod_hat = smoothen(mod_hat, self.model_smooth_n_frames)
            mod = center_crop_last(mod, mod_hat.shape[-1])
        if self.should_stretch:
            mod_hat = stretch_corners(
                mod_hat,
                max_n_corners=self.max_n_corners,
                smooth_n_frames=self.stretch_smooth_n_frames,
            )
            if self.stretch_smooth_n_frames > 1:
                mod = center_crop_last(mod, mod_hat.shape[-1])
        return mod_hat, mod, orig - mod_hat.shape[-1]

    def _prepare(self, batch, key, lfo_params=None, corpus=None):
        """render -> extract -> smooth/stretch -> crop -> validity -> upsample.

        Returns (dry, wet, mod_sr, mod_hat, mod, weights, extras) where
        extras = (dry_full, wet_full, mod_frames, fx) — the uncropped
        tensors the unfrozen-extractor path re-extracts from."""
        dry_full, wet_full, mod_frames, fx = render_batch(
            batch, self.render_cfg, corpus
        )
        t = dry_full.shape[-1]
        assert t >= self.warmup_n_samples + self.step_n_samples

        mod_hat, mod = self._extract_mod_sig(
            dry_full, wet_full, mod_frames, fx, key, lfo_params=lfo_params
        )
        mod_hat, mod, removed = self._smooth_stretch(mod_hat, mod)
        n_frames = mod_hat.shape[-1]
        n_samples = int((n_frames / (n_frames + removed)) * t)
        dry = center_crop_last(dry_full, n_samples)
        wet = center_crop_last(wet_full, n_samples)

        if self.discard_invalid_lfos:
            weights = find_valid_mod_sig_mask(mod_hat).astype(jnp.float32)
        else:
            weights = jnp.ones((dry.shape[0],), jnp.float32)

        mod_sr = linear_interpolate_last_dim(mod_hat, n_samples)[:, None, :]
        extras = (dry_full, wet_full, mod_frames, fx)
        return dry, wet, mod_sr, mod_hat, mod, weights, extras

    def _chunk_mod_sr(self, p, extras, key, n_samples):
        """Re-extract the mod signal with CURRENT (trainable) extractor
        params — the reference's unfrozen per-chunk path
        (`lightning.py:361-365`)."""
        dry_full, wet_full, mod_frames, fx = extras
        mod_hat, _ = self._extract_mod_sig(
            dry_full, wet_full, mod_frames, fx, key, lfo_params=p["lfo"]
        )
        mod_hat, _, _ = self._smooth_stretch(mod_hat, mod_hat)
        return linear_interpolate_last_dim(mod_hat, n_samples)[:, None, :]

    def _param_latent(self, p, wet, n: int):
        """Clip-level param_model latent repeated over n samples
        (`lightning.py:343-347,371-375`)."""
        lat = self.param_model.apply(p["param"], wet)  # (B, L)
        return jnp.broadcast_to(
            lat[:, :, None], (lat.shape[0], lat.shape[1], n)
        )

    # --------------------------------------------------------------- steps
    # `corpus` is a traced argument (see lfo_task.train_step note)
    def train_step_impl(
        self, state: TBPTTState, batch, key, corpus=None
    ) -> Tuple[TBPTTState, Dict]:
        """Undecorated step body, shared by `train_step` (one jitted step)
        and `train_steps` (a jitted scan of steps per dispatch)."""
        em = self.effect_model
        lfo_p0 = state.params.get("lfo") if self.trainable_lfo else None
        if lfo_p0 is not None:
            lfo_p0 = jax.lax.stop_gradient(lfo_p0)
        dry, wet, mod_sr, mod_hat, mod, weights, extras = self._prepare(
            batch, key, lfo_params=lfo_p0, corpus=corpus
        )
        b = dry.shape[0]
        w, s = self.warmup_n_samples, self.step_n_samples
        t = dry.shape[-1]
        n_chunks = (t - w) // s

        # warmup pass (`lightning.py:340-353`); param latent without grad
        warm_lat = mod_sr[:, :, :w]
        if self.param_model is not None:
            warm_lat = jnp.concatenate(
                [warm_lat,
                 jax.lax.stop_gradient(self._param_latent(state.params, wet, w))],
                axis=1,
            )
        h0 = lstm_init_state(b, em.n_hidden)
        y_warm, hidden = self._em_forward_nograd(
            self._effect_params(state.params), dry[:, :, :w], warm_lat, h0
        )
        hidden = jax.tree.map(jax.lax.stop_gradient, hidden)

        def chunk_step(carry, start):
            params, opt_state, hid = carry
            d_c = jax.lax.dynamic_slice(dry, (0, 0, start), (b, dry.shape[1], s))
            w_c = jax.lax.dynamic_slice(wet, (0, 0, start), (b, wet.shape[1], s))

            def loss_fn(p):
                if self.trainable_lfo:
                    # re-extract with current extractor params so grads
                    # flow into it (`lightning.py:361-365`)
                    mod_sr_p = self._chunk_mod_sr(p, extras, key, t)
                else:
                    mod_sr_p = mod_sr
                m_c = jax.lax.dynamic_slice(
                    mod_sr_p, (0, 0, start), (b, mod_sr_p.shape[1], s)
                )
                if self.param_model is not None:
                    m_c = jnp.concatenate(
                        [m_c, self._param_latent(p, wet, s)], axis=1
                    )
                y, new_hid = self._em_forward_grad(
                    self._effect_params(p), d_c, m_c, hid
                )
                loss, _ = self.losses(y, w_c, weights)
                return loss, (y, new_hid)

            (loss, (y, new_hid)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_hid = jax.tree.map(jax.lax.stop_gradient, new_hid)
            return (params, opt_state, new_hid), y

        starts = w + jnp.arange(n_chunks) * s
        (params, opt_state, _), ys = jax.lax.scan(
            chunk_step, (state.params, state.opt_state, hidden), starts
        )
        # ys: (n_chunks, B, C, S) -> (B, C, n_chunks * S), warmup excluded
        wet_hat = jnp.transpose(ys, (1, 2, 0, 3)).reshape(b, ys.shape[2], -1)
        wet_cmp = wet[:, :, w : w + n_chunks * s]
        _, metrics = self.losses(wet_hat, wet_cmp, weights)
        metrics["valid_fraction"] = jnp.mean(weights)

        new_state = TBPTTState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, metrics

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(
        self, state: TBPTTState, batch, key, corpus=None
    ) -> Tuple[TBPTTState, Dict]:
        return self.train_step_impl(state, batch, key, corpus)

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_steps(
        self, state: TBPTTState, batches, keys, corpus=None
    ) -> Tuple[TBPTTState, Dict]:
        """Several TBPTT outer steps in one dispatched program (see
        lfo_task.train_steps): `batches` stacked on a leading axis, `keys`
        the matching step keys; returns final state + stacked metrics."""

        def body(st, inp):
            b, k = inp
            return self.train_step_impl(st, b, k, corpus)

        return jax.lax.scan(body, state, (batches, keys))

    @partial(jax.jit, static_argnums=(0,))
    def val_step(self, params, batch, key, corpus=None) -> Dict:
        """Full-sequence forward (numerically identical to the reference's
        no-update chunk loop), warmup excluded from the metric."""
        em = self.effect_model
        lfo_p = params.get("lfo") if self.trainable_lfo else None
        dry, wet, mod_sr, mod_hat, mod, weights, _ = self._prepare(
            batch, key, lfo_params=lfo_p, corpus=corpus
        )
        b = dry.shape[0]
        w, s = self.warmup_n_samples, self.step_n_samples
        t = dry.shape[-1]
        n_chunks = (t - w) // s
        end = w + n_chunks * s
        latent = mod_sr[:, :, :end]
        if self.param_model is not None:
            latent = jnp.concatenate(
                [latent, self._param_latent(params, wet, end)], axis=1
            )
        h0 = lstm_init_state(b, em.n_hidden)
        wet_hat, _ = self._em_forward_nograd(
            self._effect_params(params), dry[:, :, :end], latent, h0
        )
        _, metrics = self.losses(
            wet_hat[:, :, w:], wet[:, :, w:end], weights
        )
        metrics["valid_fraction"] = jnp.mean(weights)
        return metrics
