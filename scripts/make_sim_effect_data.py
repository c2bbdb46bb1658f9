"""Render a self-contained "unseen effect" dry/wet corpus with the
on-device kernels — a stand-in for the reference's Melda/Ableton export
step (its README step 11) that needs no external plugins or datasets.

The effect is a fixed-character chorus driven by a triangle LFO in a
narrow rate band; the stage-2 TBPTT task then has to model it black-box
from dry/wet pairs, exactly like the Melda experiments.

Usage:
  python scripts/make_sim_effect_data.py <src_wav_dir_train> <src_wav_dir_val> [out_root]
Defaults: data/idmt_4/{train,val} -> data/sim_chorus/
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

if __name__ == "__main__":
    import jax.numpy as jnp

    from mod_extraction_tpu.data.wav import wav_read, wav_write
    from mod_extraction_tpu.ops.fx import apply_flanger_chorus
    from mod_extraction_tpu.ops.lfo import make_mod_signal_batch, shape_to_idx

    src_train = sys.argv[1] if len(sys.argv) > 1 else "data/idmt_4/train"
    src_val = sys.argv[2] if len(sys.argv) > 2 else "data/idmt_4/val"
    out_root = sys.argv[3] if len(sys.argv) > 3 else "data/sim_chorus"
    sr, seg = 44100, int(2.5 * 44100)
    rng = np.random.default_rng(7)

    for split, src_dir, n_pairs in (("train", src_train, 24), ("val", src_val, 8)):
        files = sorted(
            os.path.join(src_dir, f)
            for f in os.listdir(src_dir)
            if f.endswith(".wav")
        )
        dry_dir = os.path.join(out_root, split, "dry")
        wet_dir = os.path.join(out_root, split, "wet")
        os.makedirs(dry_dir, exist_ok=True)
        os.makedirs(wet_dir, exist_ok=True)
        drys = []
        for i in range(n_pairs):
            a, file_sr = wav_read(files[i % len(files)])
            assert file_sr == sr, f"expected {sr} Hz, got {file_sr}"
            start = int(rng.integers(0, a.shape[-1] - seg + 1))
            drys.append(a[0, start : start + seg])
        dry = jnp.asarray(np.stack(drys))[:, None, :]
        freq = jnp.asarray(rng.uniform(1.6, 1.9, n_pairs).astype(np.float32))
        phase = jnp.asarray(rng.uniform(0, 2 * np.pi, n_pairs).astype(np.float32))
        mod = make_mod_signal_batch(
            seg, sr, freq, phase, jnp.full(n_pairs, shape_to_idx("tri"))
        )
        wet = apply_flanger_chorus(
            dry, mod, sr, max_min_delay_ms=30.0, max_lfo_delay_ms=10.0,
            feedback=0.4, min_delay_width=0.6, width=0.8, depth=0.9, mix=0.9,
        )
        dry_np, wet_np = np.asarray(dry), np.asarray(wet)
        for i in range(n_pairs):
            wav_write(os.path.join(dry_dir, f"pair_{i:02d}.wav"), dry_np[i], sr)
            wav_write(os.path.join(wet_dir, f"pair_{i:02d}.wav"), wet_np[i], sr)
        print(f"{split}: {n_pairs} dry/wet pairs -> {out_root}/{split}")
