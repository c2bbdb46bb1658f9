"""Spectral2DCNN — the paper's LFO extractor.

TPU-native re-design of the reference model (`mod_extraction/models.py:128-215`):
Mel spectrogram -> (train-time) SpecAugment -> log -> stack of
[LayerNorm(bins, frames, no affine) -> dilated Conv2d 'same' -> MaxPool ->
per-channel PReLU] -> mean over the frequency axis -> 1x1 Conv -> sigmoid.
Returns (mod_sig_hat, latent), like the reference (`models.py:197-215`).

TPU mapping notes:
* channels-last layout internally (B, mels, frames, C); convs are
  `flax.linen.Conv` with kernel dilation, lowered onto the MXU.
* the mel frontend is a framing gather + rfft + one (freqs, mels) matmul
  (see ops/stft.py) fused into the same jitted step.
* SpecAugment is functional: the caller passes a PRNG key; no global RNG.
* `half_frames=True` additionally pools time by 2x in the first layers —
  OFF by default (parity), available for throughput experiments.

Paper config (`configs/models/spectral_2dcnn.yml`): in_ch=2 (dry+wet),
6x64 channels, temp_dilations [1,1,2,4,8,16], pool (2,1), masks 0.25.
Output frame rate: n_samples//hop + 1 = 345 frames per 2 s clip.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mod_extraction_tpu.models.common import (
    PReLU,
    layer_norm_no_affine,
    max_pool_floor,
)
from mod_extraction_tpu.ops.conv import (
    conv2d_freq_folded,
    conv2d_same,
    foldable,
)
from mod_extraction_tpu.ops.pallas_conv import (
    make_conv2d_custom,
    pair_supported,
    wgrad_supported,
)
from mod_extraction_tpu.ops.stft import mel_spectrogram, spec_augment


class _TrunkConv(nn.Module):
    """Drop-in for the trunk's `nn.Conv` with a selectable compute path.

    Parameter names/shapes/init match `nn.Conv` exactly (kernel HWIO
    lecun-normal + zero bias), and instances are given the `Conv_{i}`
    names flax would have auto-assigned — existing checkpoints load
    unchanged.  `impl="freq_folded"` computes the same conv via the
    freq-row-pair folded layout (ops/conv.py) when the layer qualifies
    (kernel-5 freq axis, bin dilation 1, even freq dim); otherwise it
    falls back to the plain lax path."""

    features: int
    kernel_size: Tuple[int, int]
    bin_dil: int
    temp_dil: int
    dtype: jnp.dtype
    impl: str = "lax"
    # Backward weight-gradient path: "xla" (autodiff), "pallas" (the
    # tap-concat MXU kernel, ops/pallas_conv.py), or "s2b" (the
    # space-to-batch dense framing, ops/conv.py) where supported.
    wgrad_impl: str = "xla"
    # Materialize the incoming cotangent once in the backward (custom
    # VJP + optimization_barrier + fused f32 dbias) instead of letting
    # XLA re-fuse its producer chain into every consumer — see
    # make_conv2d_custom(barrier=...).
    grad_barrier: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kf, kt = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kf, kt, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        pair_ok = self.impl == "pair" and pair_supported(
            kernel.shape, self.bin_dil, x.shape[1]
        )
        wgrad_ok = self.wgrad_impl == "pallas" and wgrad_supported(
            kernel.shape, self.bin_dil, x.shape[-1]
        )
        # the s2b framing only reshapes/strides — any bin_dil-1 layer
        # (including L0's ci=2) is covered
        s2b_ok = self.wgrad_impl == "s2b" and self.bin_dil == 1
        if self.impl == "freq_folded" and foldable(
            kernel.shape, self.bin_dil, x.shape[1]
        ):
            y = conv2d_freq_folded(x, k, self.bin_dil, self.temp_dil,
                                   preferred=None)
        elif (
            pair_ok or wgrad_ok or s2b_ok or self.grad_barrier
        ) and self.bin_dil == 1:
            conv = make_conv2d_custom(
                self.temp_dil,
                fwd_impl="pair" if pair_ok else "lax",
                dgrad_impl="pair" if pair_ok else "lax",
                wgrad_impl=(
                    "pallas" if wgrad_ok else ("s2b" if s2b_ok else "xla")
                ),
                with_bias=True,
                barrier=self.grad_barrier,
            )
            return conv(x, k, bias)
        else:
            y = conv2d_same(x, k, self.bin_dil, self.temp_dil, preferred=None)
        return y + bias.astype(y.dtype)


class Spectral2DCNN(nn.Module):
    in_ch: int = 1
    n_samples: int = 88200
    sr: float = 44100
    n_fft: int = 1024
    hop_len: int = 256
    n_mels: int = 256
    kernel_size: Tuple[int, int] = (5, 13)
    out_channels: Optional[Sequence[int]] = None
    bin_dilations: Optional[Sequence[int]] = None
    temp_dilations: Optional[Sequence[int]] = None
    pool_size: Tuple[int, int] = (3, 1)
    latent_dim: int = 1
    freq_mask_amount: float = 0.0
    time_mask_amount: float = 0.0
    use_ln: bool = True
    eps: float = 1e-7
    # MXU compute dtype for the conv stack ("float32" | "bfloat16").
    # bf16 is the TPU-native choice (~4x MXU throughput on v5e); params,
    # LayerNorm statistics, and the sigmoid head stay fp32.
    compute_dtype: str = "float32"
    # Conv compute path: "lax" (plain conv), "freq_folded" (full-lane
    # C=128 matmuls via freq-row folding, 2.4x MACs), or "pair" (the
    # row-pair freq-stride-2 conv, 1.2x MACs with full 128 output lanes,
    # used for BOTH fwd and dgrad via a custom VJP; ops/conv.py).
    conv_impl: str = "lax"
    # Weight-gradient path: "xla" or "pallas" (ops/pallas_conv.py
    # tap-concat kernel; applies to the 64-channel trunk layers only).
    wgrad_impl: str = "xla"
    # Single-materialization backward (custom VJP + optimization_barrier
    # + fused f32 dbias) — kills XLA's duplicated remat of the pool/PReLU
    # backward chain into each of wgrad/dgrad/dbias (round-4 trace).
    # False/"none", True/"all", or "l0" (first layer only — the layer
    # whose duplicated remat passes were largest relative to its FLOPs).
    grad_barrier: bool | str = False
    # Mel-frontend DFT implementation (ops/stft.py): "auto" (f32
    # DFT-matmul on TPU), "dft", "rfft", or "dft_bf16" (bf16 inputs with
    # f32 accumulation — ~0.5% power-spec noise, training-path only).
    stft_impl: str = "auto"
    # Activation-stream I/O dtype for the elementwise tail (LayerNorm +
    # PReLU): "float32" (legacy — the fp32 PReLU alpha promotes every
    # trunk activation to f32) or "compute" (keep LN/PReLU I/O in
    # `compute_dtype`, statistics still accumulated in f32; with bf16 this
    # halves the HBM bytes of the elementwise tail and of every backward
    # re-read of the trunk activations).
    act_io_dtype: str = "float32"

    def _channels(self):
        return list(self.out_channels) if self.out_channels else [64] * 5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        mask_key: Optional[jax.Array] = None,
        features: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, in_ch, n_samples) audio. Returns ((B, latent_dim, F), (B, C, F)).

        `features` (B, in_ch, mels, frames) bypasses the Mel frontend —
        used for frontend-independent parity checks against ported
        reference weights."""
        assert x.ndim == 3
        chans = self._channels()
        bin_dil = list(self.bin_dilations) if self.bin_dilations else [1] * len(chans)
        temp_dil = (
            list(self.temp_dilations)
            if self.temp_dilations
            else [2**i for i in range(len(chans))]
        )
        assert len(chans) == len(bin_dil) == len(temp_dil)
        assert self.pool_size[1] == 1

        if features is not None:
            spec = features
        else:
            spec = mel_spectrogram(
                x, int(self.sr), self.n_fft, self.hop_len, self.n_mels,
                impl=self.stft_impl,
            )  # (B, in_ch, mels, frames)
        n_frames = spec.shape[-1]

        if train and mask_key is not None and (
            self.freq_mask_amount > 0 or self.time_mask_amount > 0
        ):
            spec = spec_augment(
                mask_key,
                spec,
                int(self.freq_mask_amount * self.n_mels),
                int(self.time_mask_amount * n_frames),
            )

        h = jnp.log(jnp.maximum(spec, self.eps))
        h = jnp.transpose(h, (0, 2, 3, 1))  # (B, mels, frames, C) channel-last

        cdtype = jnp.dtype(self.compute_dtype)
        act_compute = self.act_io_dtype == "compute"
        if act_compute:
            h = h.astype(cdtype)
        for i, (out_ch, b_dil, t_dil) in enumerate(zip(chans, bin_dil, temp_dil)):
            if self.use_ln:
                # LN statistics in fp32 for stability; in "compute" mode
                # the materialized result stays in the compute dtype.
                if act_compute:
                    h = layer_norm_no_affine(
                        h, axes=(1, 2), stat_dtype=jnp.float32
                    )
                else:
                    h = layer_norm_no_affine(h.astype(jnp.float32), axes=(1, 2))
            h = _TrunkConv(
                features=out_ch,
                kernel_size=self.kernel_size,
                bin_dil=b_dil,
                temp_dil=t_dil,
                dtype=cdtype,
                impl=self.conv_impl,
                wgrad_impl=self.wgrad_impl,
                grad_barrier=(
                    self.grad_barrier is True
                    or self.grad_barrier == "all"
                    or (self.grad_barrier == "l0" and i == 0)
                ),
                name=f"Conv_{i}",  # nn.Conv's auto-name: ckpt-compatible
            )(h)
            h = max_pool_floor(h, self.pool_size)
            h = PReLU(out_ch, keep_dtype=act_compute)(h)

        h = jnp.mean(h.astype(jnp.float32), axis=1)  # freq mean -> (B, frames, C)
        latent = jnp.transpose(h, (0, 2, 1))  # (B, C, frames)

        out = nn.Dense(self.latent_dim)(h)  # 1x1 conv over frames
        out = jax.nn.sigmoid(out)
        return jnp.transpose(out, (0, 2, 1)), latent
