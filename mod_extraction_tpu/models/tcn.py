"""TCN family: dilated temporal conv blocks, FiLM conditioning, spectral
TCN extractors, and streaming (cached) causal convolutions.

TPU-native re-design of `mod_extraction/tcn.py` and the TCN-based models
in `mod_extraction/models.py:72-125,218-289`.  Key differences from the
reference:

* Streaming caches are EXPLICIT state pytrees threaded through the call
  (`stream_state` arg/return) instead of module-held buffers
  (`tcn.py:33-48`) — jit/scan/shard-friendly and trivially checkpointable.
* Channel-last internal layout; convs lower to MXU matmuls.
* `causal_crop` keeps the reference's exact (quirky) semantics
  (`tcn.py:23-29`: takes the `length` samples ending one BEFORE the end).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mod_extraction_tpu.models.common import PReLU, layer_norm_no_affine
from mod_extraction_tpu.ops.stft import spectrogram


def center_crop(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """reference `tcn.py:14-20`."""
    if x.shape[-1] == length:
        return x
    start = (x.shape[-1] - length) // 2
    return x[..., start : start + length]


def causal_crop(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """reference `tcn.py:23-29` (note: excludes the final sample)."""
    if x.shape[-1] == length:
        return x
    stop = x.shape[-1] - 1
    return x[..., stop - length : stop]


class FiLM(nn.Module):
    """Feature-wise linear modulation (`tcn.py:79-100`)."""

    cond_dim: int
    num_features: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray, train: bool = False):
        """x: (B, T, C) channel-last; cond: (B, cond_dim)."""
        gb = nn.Dense(2 * self.num_features, name="adaptor")(cond)
        g, b = jnp.split(gb, 2, axis=-1)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                use_bias=False,
                use_scale=False,
                name="bn",
                axis=-1,
            )(x)
        return x * g[:, None, :] + b[:, None, :]


class TCNBlock(nn.Module):
    """LN -> dilated Conv1d -> FiLM? -> PReLU -> 1x1 residual (`tcn.py:103-195`)."""

    in_ch: int
    out_ch: int
    kernel_size: int = 3
    dilation: int = 1
    stride: int = 1
    padding: Optional[int] = 0  # None => 'same'-ish auto padding (non-causal)
    use_ln: bool = False
    temporal_dim: Optional[int] = None
    use_act: bool = True
    use_res: bool = True
    cond_dim: int = 0
    use_film_bn: bool = True
    is_causal: bool = True
    is_cached: bool = False

    def cache_len(self) -> int:
        return (self.kernel_size - 1) * self.dilation

    @nn.compact
    def __call__(self, x, cond=None, train=False, stream_state=None):
        """x: (B, C, T) channel-first (reference API). Returns y (B, C', T')
        and, when is_cached, (y, new_stream_state)."""
        assert x.ndim == 3
        x_in = x
        crop_fn = causal_crop if self.is_causal else center_crop

        h = x
        if self.use_ln:
            # LayerNorm over (C, T) per example (`tcn.py:152`)
            h = layer_norm_no_affine(h, axes=(1, 2))

        h = jnp.transpose(h, (0, 2, 1))  # (B, T, C)
        new_state = None
        if self.is_cached:
            assert self.is_causal
            pad = self.cache_len()
            if stream_state is None:
                cache = jnp.zeros((h.shape[0], pad, h.shape[2]), h.dtype)
            else:
                cache = stream_state
            h = jnp.concatenate([cache, h], axis=1)
            new_state = h[:, -pad:, :]
            padding = "VALID"
        elif self.is_causal:
            assert self.padding in (0, None) or self.padding == 0
            padding = "VALID"
        else:
            pad = (
                self.kernel_size // 2 * self.dilation
                if self.padding is None
                else self.padding
            )
            padding = [(pad, pad)]

        h = nn.Conv(
            self.out_ch,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=padding,
            name="conv",
        )(h)

        if self.cond_dim > 0:
            assert cond is not None
            h = FiLM(self.cond_dim, self.out_ch, self.use_film_bn, name="film")(
                h, cond, train
            )
        if self.use_act:
            h = PReLU(self.out_ch, name="act")(h)

        h = jnp.transpose(h, (0, 2, 1))  # (B, C', T')
        if self.use_res:
            res = nn.Conv(
                self.out_ch,
                kernel_size=(1,),
                strides=(self.stride,),
                use_bias=False,
                name="res",
            )(jnp.transpose(x_in, (0, 2, 1)))
            res = jnp.transpose(res, (0, 2, 1))
            h = h + crop_fn(res, h.shape[-1])

        if self.is_cached:
            return h, new_state
        return h


class TCN(nn.Module):
    """Stacked TCN (`tcn.py:198-302`)."""

    out_channels: Sequence[int]
    dilations: Optional[Sequence[int]] = None
    in_ch: int = 1
    kernel_size: int = 13
    strides: Optional[Sequence[int]] = None
    padding: Optional[int] = 0
    use_ln: bool = False
    temporal_dims: Optional[Sequence[int]] = None
    use_act: bool = True
    use_res: bool = True
    cond_dim: int = 0
    use_film_bn: bool = False
    is_causal: bool = True
    is_cached: bool = False

    def _dilations(self):
        return (
            list(self.dilations)
            if self.dilations is not None
            else [4**i for i in range(len(self.out_channels))]
        )

    def _strides(self):
        return (
            list(self.strides)
            if self.strides is not None
            else [1] * len(self.out_channels)
        )

    @nn.compact
    def __call__(self, x, cond=None, train=False, stream_state=None):
        dils, strs = self._dilations(), self._strides()
        in_ch = self.in_ch
        new_states = []
        for idx, (out_ch, dil, stride) in enumerate(
            zip(self.out_channels, dils, strs)
        ):
            temporal_dim = (
                self.temporal_dims[idx] if self.temporal_dims is not None else None
            )
            block = TCNBlock(
                in_ch,
                out_ch,
                self.kernel_size,
                dil,
                stride,
                self.padding,
                self.use_ln,
                temporal_dim,
                self.use_act,
                self.use_res,
                self.cond_dim,
                self.use_film_bn,
                self.is_causal,
                self.is_cached,
                name=f"block_{idx}",
            )
            if self.is_cached:
                st = None if stream_state is None else stream_state[idx]
                x, ns = block(x, cond, train, st)
                new_states.append(ns)
            else:
                x = block(x, cond, train)
            in_ch = out_ch
        if self.is_cached:
            return x, new_states
        return x

    def calc_receptive_field(self) -> int:
        """reference `tcn.py:295-302`."""
        dils = self._dilations()
        assert all(s == 1 for s in self._strides())
        assert dils[0] == 1
        rf = self.kernel_size
        for dil in dils[1:]:
            rf += (self.kernel_size - 1) * dil
        return rf


class SpectralTCN(nn.Module):
    """Spectrogram -> log -> non-causal TCN -> 1x1 -> sigmoid
    (`models.py:72-125`).  Returns (mod_sig_hat, latent) — the latent is
    the pre-output feature map (the reference returns only the signal)."""

    n_samples: int = 88200
    n_fft: int = 1024
    hop_len: int = 256
    kernel_size: int = 13
    out_channels: Optional[Sequence[int]] = None
    dilations: Optional[Sequence[int]] = None
    latent_dim: int = 1
    use_ln: bool = True
    use_res: bool = True
    eps: float = 1e-7

    @nn.compact
    def __call__(self, x, train=False, mask_key=None):
        assert x.ndim == 3
        chans = list(self.out_channels) if self.out_channels else [96] * 5
        dils = (
            list(self.dilations)
            if self.dilations
            else [2**i for i in range(len(chans))]
        )
        n_frames = self.n_samples // self.hop_len + 1
        spec = spectrogram(x, self.n_fft, self.hop_len)[:, 0]  # (B, F, T)
        h = jnp.log(jnp.maximum(spec, self.eps))
        h = TCN(
            chans,
            dils,
            in_ch=self.n_fft // 2 + 1,
            kernel_size=self.kernel_size,
            padding=None,
            use_ln=self.use_ln,
            temporal_dims=[n_frames] * len(chans),
            use_res=self.use_res,
            is_causal=False,
            name="tcn",
        )(h)
        latent = h
        out = nn.Dense(self.latent_dim, name="output")(jnp.transpose(h, (0, 2, 1)))
        out = jnp.transpose(jnp.asarray(out), (0, 2, 1))
        return nn.sigmoid(out), latent


class SpectralDSTCN(nn.Module):
    """Downsampling spectral TCN -> temporal mean -> FC head
    (`models.py:218-289`); clip-level regressor with sigmoid output."""

    n_samples: int = 88200
    n_fft: int = 1024
    hop_len: int = 256
    kernel_size: int = 13
    out_channels: Optional[Sequence[int]] = None
    dilations: Optional[Sequence[int]] = None
    strides: Optional[Sequence[int]] = None
    n_fc_units: int = 48
    latent_dim: int = 2
    use_ln: bool = True
    use_res: bool = True
    eps: float = 1e-7

    @nn.compact
    def __call__(self, x, train=False, mask_key=None):
        assert x.ndim == 3
        chans = list(self.out_channels) if self.out_channels else [96] * 5
        dils = (
            list(self.dilations)
            if self.dilations
            else [2**i for i in range(len(chans))]
        )
        strs = list(self.strides) if self.strides else [2] * len(chans)
        n_frames = self.n_samples // self.hop_len + 1
        temporal_dims = [n_frames]
        cur = n_frames
        for s in strs[:-1]:
            cur = math.ceil(cur / s)
            temporal_dims.append(cur)
        spec = spectrogram(x, self.n_fft, self.hop_len)[:, 0]
        h = jnp.log(jnp.maximum(spec, self.eps))
        h = TCN(
            chans,
            dils,
            in_ch=self.n_fft // 2 + 1,
            kernel_size=self.kernel_size,
            strides=strs,
            padding=None,
            use_ln=self.use_ln,
            temporal_dims=temporal_dims,
            use_res=self.use_res,
            is_causal=False,
            name="tcn",
        )(h)
        h = jnp.mean(h, axis=-1)  # (B, C)
        h = nn.Dense(self.n_fc_units, name="fc")(h)
        h = PReLU(self.n_fc_units, name="fc_act")(h)
        h = nn.Dense(self.latent_dim, name="output")(h)
        return nn.sigmoid(h)
