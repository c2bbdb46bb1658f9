"""Measure the extractor-level effect of the phaser warm-up transient
(PARITY.md "Known deviations"; VERDICT r2 weak #6 / next-round #7).

tests/test_phaser_warmup.py pins the AUDIO-level deviation (cold-start
vs the reference's warmed-crop recipe: ESR <= 4.2e-4).  This script pins
the METRIC-level one: render the same eval-regime phaser batch both ways
(identical LFO phases), run the shipped extractor on (dry, wet) for
each, and report val/l1 against the same GT mod signal.

Usage (real chip, TPU idle): python scripts/measure_phaser_warmup_delta.py
Prints one line: cold l1, warm l1, |delta|.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SR = 44100.0
N = 88200
BATCH = 64
EXTRACTOR = (
    "models/lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r5.npz"
)


def main():
    import jax
    import jax.numpy as jnp

    from mod_extraction_tpu.cli import load_yaml_with_includes, build_model
    from mod_extraction_tpu.data.wav import wav_read
    from mod_extraction_tpu.ops.fx import apply_phaser
    from mod_extraction_tpu.utils.interp import linear_interpolate_last_dim

    rng = np.random.default_rng(123)
    src = "data/idmt_4/val"
    files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".wav")
    )
    drys = []
    for i in range(BATCH):
        a, sr = wav_read(files[i % len(files)])
        assert sr == SR
        start = int(rng.integers(0, a.shape[-1] - N + 1))
        drys.append(a[0, start : start + N])
    dry = jnp.asarray(np.stack(drys)[:, None, :])

    # eval_lfo.yml regime: rate log-uniform 0.5-3, depth 1, centre 440,
    # feedback 0.25, mix 1.0; uniform phase
    rate = jnp.asarray(
        np.exp(rng.uniform(np.log(0.5), np.log(3.0), BATCH)).astype(np.float32)
    )
    phase = jnp.asarray(rng.uniform(0, 2 * np.pi, BATCH).astype(np.float32))
    kw = dict(sr=SR, rate_hz=rate, depth=1.0, centre_frequency_hz=440.0,
              feedback=0.25, mix=1.0)

    wet_cold, mod = apply_phaser(dry, phase=phase, **kw)

    # warmed render: one max-period pad (4-aligned), phase rolled back
    warm = int(SR / 0.5)
    warm -= warm % 4
    pad = jnp.asarray(
        (0.3 * rng.standard_normal((BATCH, 1, warm))).astype(np.float32)
    )
    dry_long = jnp.concatenate([pad, dry], axis=2)
    phase_long = phase - 2.0 * np.pi * rate * warm / SR
    wet_long, _ = apply_phaser(dry_long, phase=phase_long, **kw)
    wet_warm = wet_long[:, :, warm:]

    model_cfg = load_yaml_with_includes("configs/models/spectral_2dcnn.yml")
    model = build_model(model_cfg, {"n_samples": N, "sr": SR})
    from mod_extraction_tpu.train.checkpoints import load_weights

    params = load_weights(EXTRACTOR)
    if "params" not in params:
        params = {"params": params}

    @jax.jit
    def l1(wet):
        x = jnp.concatenate([dry, wet], axis=1)
        mod_hat, _ = model.apply(params, x)
        gt = linear_interpolate_last_dim(mod[:, ::100], mod_hat.shape[-1])
        return jnp.mean(jnp.abs(mod_hat[:, 0, :] - gt))

    l1_cold = float(l1(wet_cold))
    l1_warm = float(l1(wet_warm))
    print(
        f"phaser warmup extractor delta: cold l1={l1_cold:.5f} "
        f"warm l1={l1_warm:.5f} |delta|={abs(l1_cold - l1_warm):.6f}"
    )


if __name__ == "__main__":
    main()
