"""Mixed-effect batch routing: an interwoven batch where each row uses a
different effect must produce, per row, exactly what calling that
effect's renderer directly produces (the `where`-select routing in
train/render.py replaces the reference's per-dataset render paths)."""

import jax
import jax.numpy as jnp
import numpy as np

from mod_extraction_tpu.data.datasets import default_fx
from mod_extraction_tpu.ops.fx import (
    apply_flanger_chorus,
    apply_phaser,
    apply_tremolo,
)
from mod_extraction_tpu.train.render import RenderConfig, render_batch
from mod_extraction_tpu.utils.interp import linear_interpolate_last_dim

SR, N = 8000.0, 4000


def test_mixed_batch_routes_each_row_to_its_effect(rng):
    b = 4
    dry = rng.uniform(-0.5, 0.5, (b, 1, N)).astype(np.float32)
    mod = rng.uniform(0.1, 0.9, (b, N // 100)).astype(np.float32)

    fx = {k: np.zeros(b, np.float32) for k in default_fx() if k != "effect_idx"}
    fx = {k: v for k, v in fx.items()}
    fx["effect_idx"] = np.array([1, 2, 3, 0], np.int32)  # trem, fl, ph, none
    fx["shape"] = np.zeros(b, np.int32)
    fx["mix"] = np.array([0.8, 0.9, 0.7, 0.0], np.float32)
    fx["depth"] = np.array([0.0, 0.9, 0.6, 0.0], np.float32)
    fx["feedback"] = np.array([0.0, 0.3, 0.2, 0.0], np.float32)
    fx["width"] = np.array([0.0, 0.7, 0.0, 0.0], np.float32)
    fx["min_delay_width"] = np.array([0.0, 0.5, 0.0, 0.0], np.float32)
    fx["max_min_delay_ms"] = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    fx["max_lfo_delay_ms"] = np.array([0.0, 10.0, 0.0, 0.0], np.float32)
    fx["rate_hz"] = np.array([0.0, 0.0, 1.5, 0.0], np.float32)
    fx["phase"] = np.array([0.0, 0.0, 1.1, 0.0], np.float32)
    fx["centre_frequency_hz"] = np.array([0.0, 0.0, 800.0, 0.0], np.float32)
    fx["exp"] = np.ones(b, np.float32)

    cfg = RenderConfig(
        sr=SR, n_samples=N, effects=(1, 2, 3), max_delay_samples=89
    )
    batch = {"dry": dry, "mod_sig": mod, "fx": fx}
    dry_o, wet, mod_o, _ = render_batch(
        jax.tree.map(jnp.asarray, batch), cfg
    )
    wet = np.asarray(wet)

    mod_audio = np.asarray(linear_interpolate_last_dim(jnp.asarray(mod), N))

    # row 0: tremolo
    trem = np.asarray(
        apply_tremolo(jnp.asarray(dry[:1]), jnp.asarray(mod_audio[:1]), 0.8)
    )
    np.testing.assert_allclose(wet[0], trem[0], atol=1e-6)

    # row 1: flanger (same unified buffer length as the render stage)
    fl = np.asarray(
        apply_flanger_chorus(
            jnp.asarray(dry[1:2]), jnp.asarray(mod_audio[1:2]), SR,
            max_min_delay_ms=1.0, max_lfo_delay_ms=10.0, feedback=0.3,
            min_delay_width=0.5, width=0.7, depth=0.9, mix=0.9,
            implementation="scan",
        )
    )
    np.testing.assert_allclose(wet[1], fl[0], atol=1e-5)

    # row 2: phaser (+ its GT mod sig replaces the incoming one)
    ph, ph_mod = apply_phaser(
        jnp.asarray(dry[2:3]), SR, 1.5, 0.6, 800.0, 0.2, 0.7, phase=1.1,
    )
    np.testing.assert_allclose(wet[2], np.asarray(ph)[0], atol=1e-5)
    expect_frames = np.asarray(
        linear_interpolate_last_dim(ph_mod, N // 100)
    )[0]
    np.testing.assert_allclose(np.asarray(mod_o)[2], expect_frames, atol=1e-5)

    # row 3: effect_idx 0 -> wet stays zeros (dataset-provided wet absent)
    np.testing.assert_array_equal(wet[3], np.zeros_like(wet[3]))
    # non-phaser rows keep their host mod sig
    np.testing.assert_allclose(np.asarray(mod_o)[0], mod[0], atol=0)
