"""Streaming (serving) benchmark: real-time factor of the exported
LSTM-64 effect processor, the reference's Neutone/VST deployment surface
(`/root/reference/scripts/export_neutone_models.py:109-124` — native
44.1 kHz, any buffer size).

Two numbers per buffer size:

* **per-call RTF** — one `process()` round trip per buffer, output
  pulled to host each call, state carried on host exactly like a plugin
  host drives a processor.  Includes dispatch/transfer overhead (on a
  tunneled-TPU dev box that overhead dominates small buffers; on a local
  backend it is the honest serving number).
* **sustained RTF** — buffers chained inside one jitted `lax.scan`
  (state threads buffer-to-buffer on device), measuring pure device
  throughput for offline/batch streaming (e.g. rendering a whole song
  through the plugin graph).

RTF > 1 means faster than real time.  Usage:

    python scripts/bench_streaming.py [--weights models/<lstm>.npz]
        [--buffer-sizes 128,512,2048] [--seconds 2.0] [--channels 2]

Prints one human table and one JSON line (list of rows).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SR = 44100.0


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument(
        "--weights",
        default="models/lstm_64__lfo_2dcnn_r4__sim_phaser.npz",
        help="LSTM-64 effect-model .npz (random init if missing)",
    )
    p.add_argument("--buffer-sizes", default="128,512,2048")
    p.add_argument(
        "--seconds", type=float, default=2.0,
        help="audio seconds processed per measurement",
    )
    p.add_argument("--channels", type=int, default=2)
    return p.parse_args(argv)


def _load_params(weights_path: str, model, n_channels: int):
    import jax
    import jax.numpy as jnp

    if os.path.exists(weights_path):
        from mod_extraction_tpu.train.checkpoints import load_weights

        return {"params": load_weights(weights_path)}, weights_path
    from mod_extraction_tpu.models.lstm import lstm_init_state

    x = jnp.zeros((n_channels, 1, 256), jnp.float32)
    state = lstm_init_state(n_channels, model.n_hidden)
    params = model.init(jax.random.PRNGKey(0), x, x, state)
    return params, "(random init)"


def bench_per_call(proc, state, buf_np, n_buffers: int) -> float:
    """Plugin-host style: one process() + host pull per buffer."""
    # warmup/compile for this buffer length
    _y, _s = proc.process_np(state, buf_np)
    t0 = time.perf_counter()
    s = state
    for _ in range(n_buffers):
        y, s = proc.process_np(s, buf_np)
    dt = time.perf_counter() - t0
    return (n_buffers * buf_np.shape[-1] / SR) / dt


def bench_sustained(proc, state, buf_np, n_buffers: int) -> float:
    """Scan-chained on-device streaming; one host pull at the end."""
    import jax
    import jax.numpy as jnp

    bufs = jnp.asarray(
        np.broadcast_to(buf_np, (n_buffers,) + buf_np.shape).copy()
    )
    rate = jnp.float32(0.2)
    depth = jnp.float32(0.6667)
    off = jnp.float32(0.0)

    @jax.jit
    def run(state, bufs):
        def step(s, x):
            y, s = proc.process(s, x, rate, depth, off)
            return s, jnp.sum(y)
        s, sums = jax.lax.scan(step, state, bufs)
        return jnp.sum(sums)

    # NOTE: float() pulls fence the computation; block_until_ready does
    # not actually block under tunneled backends (verify SKILL.md).
    float(run(state, bufs))  # compile + warmup
    t0 = time.perf_counter()
    float(run(state, bufs))
    dt = time.perf_counter() - t0
    return (n_buffers * buf_np.shape[-1] / SR) / dt


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])

    import jax

    from mod_extraction_tpu.export.streaming import StreamingEffectModel

    proc = StreamingEffectModel(None, n_channels=args.channels)
    proc.params, src = _load_params(args.weights, proc.model, args.channels)
    state = proc.init_state()

    # the deserialized StableHLO artifact (the runtime-loadable export) —
    # same weights, portable scan lowering
    from mod_extraction_tpu.export.streaming import (
        CompiledStreamingProcessor,
        serialize_streaming_processor,
    )

    artifact = CompiledStreamingProcessor(
        serialize_streaming_processor(proc),
        n_channels=args.channels,
        n_hidden=proc.n_hidden,
    )

    rng = np.random.default_rng(0)
    rows = []
    for bs in [int(s) for s in args.buffer_sizes.split(",")]:
        n_buffers = max(int(args.seconds * SR / bs), 2)
        buf = (rng.standard_normal((args.channels, bs)) * 0.1).astype(
            np.float32
        )
        per_call = bench_per_call(proc, state, buf, n_buffers)
        sustained = bench_sustained(proc, state, buf, n_buffers)
        art_call = bench_per_call(artifact, artifact.init_state(), buf, n_buffers)
        rows.append(
            {
                "buffer_size": bs,
                "latency_budget_ms": round(bs / SR * 1e3, 2),
                "rtf_per_call": round(per_call, 2),
                "rtf_sustained": round(sustained, 2),
                "rtf_artifact_per_call": round(art_call, 2),
            }
        )
        print(
            f"buffer {bs:5d} ({rows[-1]['latency_budget_ms']:7.2f} ms): "
            f"per-call RTF {per_call:8.2f}  sustained RTF {sustained:8.2f}  "
            f"artifact RTF {art_call:8.2f}"
        )
    print(
        json.dumps(
            {
                "metric": "streaming_rtf",
                "backend": jax.default_backend(),
                "weights": src,
                "channels": args.channels,
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
