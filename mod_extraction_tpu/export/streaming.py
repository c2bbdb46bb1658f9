"""Streaming (real-time) inference — the Neutone/VST export analog.

Re-design of `scripts/export_neutone_models.py`.  The reference wraps the
LSTM-64 in a TorchScript module with hidden state + LFO phase held as
module attributes (`export_neutone_models.py:29-49`, `models.py:292-308`).
Here ALL state is an explicit pytree carried across buffer calls, so the
processor is a pure jitted function: correct for ANY buffer size,
checkpointable, and host-embeddable (a thin C++/ctypes host can drive it
buffer-by-buffer).

Functional parity targets:
* stateful cos LFO continuing from the previous buffer's phase
  (`export_neutone_models.py:35-42`), stereo via a phase offset
  (`:43-44`),
* knob mappings: lfo_rate [0.1, 5] Hz, lfo_depth [0, 1.5], stereo phase
  offset [0, 2pi] (`:117-124`),
* native 44.1 kHz, any buffer size (`:109-115`).

The exported artifact is a directory with weights (.npz) + metadata.json
+ a self-contained StableHLO processor (`processor.stablehlo`, via
jax.export with a symbolic buffer dimension) — the serialized-module
contract of the `.nm` container: runtime-loadable with no Python model
definition, weights baked in, any buffer size, cpu+tpu lowerings.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mod_extraction_tpu.models.lstm import LSTMEffectModel
from mod_extraction_tpu.paths import ensure_dir
from mod_extraction_tpu.train.checkpoints import load_weights, save_weights


def init_stream_state(n_channels: int, n_hidden: int) -> Dict:
    z = jnp.zeros((n_channels, n_hidden), jnp.float32)
    return {"h": z, "c": z, "phase": jnp.zeros((), jnp.float32)}


class StreamingEffectModel:
    """Buffer-by-buffer LFO-driven effect processor."""

    def __init__(
        self,
        params,
        n_hidden: int = 64,
        sr: float = 44100.0,
        n_channels: int = 2,
        lstm_impl: str = "auto",
        unroll: int = 8,
    ) -> None:
        self.model = LSTMEffectModel(
            in_ch=1, out_ch=1, n_hidden=n_hidden, latent_dim=1, unroll=unroll
        )
        self.params = params
        self.sr = sr
        self.n_hidden = n_hidden
        self.n_channels = n_channels
        self.lstm_impl = lstm_impl

    def init_state(self) -> Dict:
        return init_stream_state(self.n_channels, self.n_hidden)

    @partial(jax.jit, static_argnums=(0,))
    def process(
        self,
        state: Dict,
        x: jnp.ndarray,
        lfo_rate: jnp.ndarray,
        lfo_depth: jnp.ndarray,
        lfo_stereo_phase_offset: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, Dict]:
        """x: (n_channels, buffer_len) -> (y, new_state).

        Recompiles once per distinct buffer length (any size supported)."""
        use_pallas = (
            self.lstm_impl in ("pallas", "auto")
            and jax.default_backend() == "tpu"
        )
        return self._process_impl(
            state, x, lfo_rate, lfo_depth, lfo_stereo_phase_offset, use_pallas
        )

    def _process_impl(
        self,
        state: Dict,
        x: jnp.ndarray,
        lfo_rate: jnp.ndarray,
        lfo_depth: jnp.ndarray,
        lfo_stereo_phase_offset: jnp.ndarray,
        use_pallas: bool,
    ) -> Tuple[jnp.ndarray, Dict]:
        c, t = x.shape
        i = jnp.arange(1, t + 1, dtype=jnp.float32)
        arg_l = (2.0 * jnp.pi / self.sr) * lfo_rate * i + state["phase"]
        next_phase = jnp.mod(arg_l[-1], 2.0 * jnp.pi)
        offsets = jnp.arange(c, dtype=jnp.float32) * lfo_stereo_phase_offset
        arg = arg_l[None, :] + offsets[:, None]
        lfo = (jnp.cos(arg) + 1.0) / 2.0 * lfo_depth  # (C, T)

        if use_pallas:
            from mod_extraction_tpu.ops.pallas_lstm import lstm_effect_model_pallas

            y, (h, c_state) = lstm_effect_model_pallas(
                self.params,
                x[:, None, :],  # channels as batch
                lfo[:, None, :],
                (state["h"], state["c"]),
            )
        else:
            y, (h, c_state) = self.model.apply(
                self.params,
                x[:, None, :],
                lfo[:, None, :],
                (state["h"], state["c"]),
            )
        return y[:, 0, :], {"h": h, "c": c_state, "phase": next_phase}

    def process_np(self, state, x: np.ndarray, lfo_rate=0.2, lfo_depth=0.6667,
                   stereo_offset=0.0):
        y, state = self.process(
            state,
            jnp.asarray(x, jnp.float32),
            jnp.float32(lfo_rate),
            jnp.float32(lfo_depth),
            jnp.float32(stereo_offset),
        )
        return np.asarray(y), state


DEFAULT_METADATA = {
    "model_authors": ["mod_extraction_tpu"],
    "model_short_description": "LFO extraction evaluation model.",
    "technical_links": {
        "Paper": "https://arxiv.org/abs/2305.13262",
        "Code": "https://github.com/christhetree/mod_extraction/",
    },
    "tags": ["lfo", "phaser", "flanger", "chorus"],
    "model_version": "1.0.0",
    "is_experimental": True,
    "neutone_parameters": [
        {"name": "lfo_rate", "description": "LFO rate [0.1 to 5 Hz]",
         "default_value": 0.2},
        {"name": "lfo_depth", "description": "LFO depth [0.0, 1.5]",
         "default_value": 0.66666666},
        {"name": "lfo_stereo_phase_offset",
         "description": "LFO stereo phase offset [0.0, 2pi]",
         "default_value": 0.0},
    ],
    "native_sample_rates": [44100],
    "native_buffer_sizes": [],  # all sizes supported
    "input_gain_default": 0.4,
    "is_input_mono": False,
    "is_output_mono": False,
}


def knob_to_params(knobs: Dict[str, float]) -> Dict[str, float]:
    """Normalized [0,1] knobs -> physical params
    (`export_neutone_models.py:117-124`)."""
    return {
        "lfo_rate": knobs.get("lfo_rate", 0.2) * 4.9 + 0.1,
        "lfo_depth": knobs.get("lfo_depth", 0.6667) * 1.5,
        "lfo_stereo_phase_offset": knobs.get("lfo_stereo_phase_offset", 0.0)
        * 2.0
        * np.pi,
    }


ARTIFACT_NAME = "processor.stablehlo"


def serialize_streaming_processor(
    sm: StreamingEffectModel, platforms: Tuple[str, ...] = ("cpu", "tpu")
) -> bytes:
    """Serialize the WHOLE processor (weights baked in) as a StableHLO
    artifact with a SYMBOLIC buffer dimension — the TPU-native analogue of
    the reference's TorchScript `.nm` (`export_neutone_models.py:135-138`):
    one self-contained, runtime-loadable artifact that serves ANY buffer
    size with no Python model definition and no per-size retrace.

    Uses the portable scan LSTM (not the Pallas kernel) so one artifact
    lowers for both cpu and tpu."""
    from jax import export as jax_export

    # unroll=1: scan unrolling needs floordiv comparisons on the (symbolic)
    # buffer length, which shape polymorphism cannot decide
    sm = StreamingEffectModel(
        sm.params, n_hidden=sm.n_hidden, sr=sm.sr,
        n_channels=sm.n_channels, lstm_impl="scan", unroll=1,
    )
    (t,) = jax_export.symbolic_shape("t")
    f32 = jnp.float32
    c, h = sm.n_channels, sm.n_hidden
    state_spec = {
        "h": jax.ShapeDtypeStruct((c, h), f32),
        "c": jax.ShapeDtypeStruct((c, h), f32),
        "phase": jax.ShapeDtypeStruct((), f32),
    }
    scalar = jax.ShapeDtypeStruct((), f32)

    def fn(state, x, lfo_rate, lfo_depth, lfo_stereo_phase_offset):
        return sm._process_impl(
            state, x, lfo_rate, lfo_depth, lfo_stereo_phase_offset,
            use_pallas=False,
        )

    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        state_spec, jax.ShapeDtypeStruct((c, t), f32), scalar, scalar, scalar
    )
    return exported.serialize()


class CompiledStreamingProcessor:
    """Drives a deserialized processor artifact buffer-by-buffer —
    everything a host (or a thin C++ embedding via PJRT) needs, with no
    dependency on the model code."""

    def __init__(self, artifact: bytes, n_channels: int, n_hidden: int):
        from jax import export as jax_export

        self.exported = jax_export.deserialize(artifact)
        # exported.call re-traces on every invocation; jit it so each
        # buffer shape lowers once and then dispatches from cache
        self._call = jax.jit(self.exported.call)
        self.n_channels = n_channels
        self.n_hidden = n_hidden

    def init_state(self) -> Dict:
        return init_stream_state(self.n_channels, self.n_hidden)

    def process_np(self, state, x: np.ndarray, lfo_rate=0.2, lfo_depth=0.6667,
                   stereo_offset=0.0):
        y, state = self._call(
            state,
            jnp.asarray(x, jnp.float32),
            jnp.float32(lfo_rate),
            jnp.float32(lfo_depth),
            jnp.float32(stereo_offset),
        )
        return np.asarray(y), state


def export_streaming_model(
    params,
    out_dir: str,
    model_name: str,
    n_hidden: int = 64,
    sr: float = 44100.0,
    metadata_overrides: Optional[Dict] = None,
    with_artifact: bool = True,
) -> str:
    """Write the exported plugin directory: weights + metadata + (by
    default) the self-contained StableHLO processor artifact.

    Replaces `save_neutone_model` usage (`export_neutone_models.py:135-138`)."""
    target = ensure_dir(os.path.join(out_dir, model_name))
    save_weights(os.path.join(target, "weights.npz"), params.get("params", params))
    meta = dict(DEFAULT_METADATA)
    meta.update(metadata_overrides or {})
    meta.update({"model_name": model_name, "n_hidden": n_hidden, "sr": sr})
    if with_artifact:
        sm = StreamingEffectModel(
            params if "params" in params else {"params": params},
            n_hidden=n_hidden, sr=sr,
        )
        artifact = serialize_streaming_processor(sm)
        with open(os.path.join(target, ARTIFACT_NAME), "wb") as f:
            f.write(artifact)
        meta["compiled_artifact"] = ARTIFACT_NAME
        meta["compiled_artifact_platforms"] = ["cpu", "tpu"]
    with open(os.path.join(target, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return target


def load_compiled_processor(export_dir: str) -> CompiledStreamingProcessor:
    """Load ONLY the serialized artifact — no model code, no weights file."""
    with open(os.path.join(export_dir, "metadata.json")) as f:
        meta = json.load(f)
    with open(os.path.join(export_dir, meta["compiled_artifact"]), "rb") as f:
        artifact = f.read()
    return CompiledStreamingProcessor(
        artifact,
        n_channels=2 if not meta.get("is_input_mono") else 1,
        n_hidden=meta.get("n_hidden", 64),
    )


def load_streaming_model(export_dir: str) -> StreamingEffectModel:
    with open(os.path.join(export_dir, "metadata.json")) as f:
        meta = json.load(f)
    params = {"params": load_weights(os.path.join(export_dir, "weights.npz"))}
    return StreamingEffectModel(
        params, n_hidden=meta.get("n_hidden", 64), sr=meta.get("sr", 44100.0)
    )
