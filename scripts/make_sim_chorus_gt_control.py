"""Render the ground-truth-conditioned sim_chorus CONTROL corpus
(VERDICT r2 missing #2 / next-round #3).

The shipped sim_chorus stage-2 result is LSTM-64 esr 0.4224 with the
extractor's conditioning vs 0.4244 for the random-LFO baseline — no
conditioning win, explained as an "LSTM-64 capacity floor".  The control
that settles it: train the SAME LSTM-64 in the SAME effect regime but
conditioned on the GROUND-TRUTH mod signal (the task's `lfo_model: null`
path).  If GT also fails, the capacity-floor claim stands; if GT wins,
the extractor conditioning path is at fault.

GT conditioning needs the mod signal per training chunk, which the
dry/wet corpus (`data/sim_chorus`, wav pairs only) cannot provide — so
this script renders a PREPROCESSED-triplet corpus (`pair_XX.npz` with
mod_sig/fx_params + `pair_XX_dry.wav` + `pair_XX_wet.wav`, the reference
`datasets.py:504-534` layout) of exactly n_samples-long examples in the
EXACT shipped sim_chorus regime: quasiperiodic tri 1.6-1.9 Hz LFO,
chorus delay block 30 ms / 10 ms, feedback 0.3, min_delay_width 0.367,
width 0.8, depth 1.0, mix 0.9 (scripts/make_sim_effect_data.py::_render).

Usage: python scripts/make_sim_chorus_gt_control.py [--regime chorus|chorus2]
          [--out DIR] [--n-train 256] [--n-val 96] [--n-samples 88200]
`--regime chorus2` renders the round-4 SHORT-delay regime (5-10 ms sweep:
min_delay_width 0.167, width 0.5 — make_sim_effect_data.py::sim_chorus2)
to data/sim_chorus2_gt; the default renders the original shipped regime.
Rendering uses the device flanger kernel; run it on the TPU (seconds)
or CPU (slow first compile).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SR = 44100
MOD_SIG_DIVISOR = 100  # dataset-side LFO frame rate (reference sr/100)


def _opt(argv, name, default, cast=str):
    if name in argv:
        return cast(argv[argv.index(name) + 1])
    return default


def render_split(
    rng: np.random.Generator,
    src_dir: str,
    out_dir: str,
    n_examples: int,
    n_samples: int,
    batch: int = 32,
    min_delay_width: float = 0.367,
    width: float = 0.8,
    delay_mix: float = 0.9,
    trem_mix: float = 0.0,
) -> None:
    import jax.numpy as jnp

    from mod_extraction_tpu.data.mods import (
        make_quasi_periodic,
        np_make_mod_signal,
    )
    from mod_extraction_tpu.data.wav import wav_read, wav_write
    from mod_extraction_tpu.ops.fx import apply_flanger_chorus, apply_tremolo

    files = sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(".wav")
    )
    assert files, f"no wavs under {src_dir} (run make_synthetic_corpus.py)"
    os.makedirs(out_dir, exist_ok=True)

    done = 0
    while done < n_examples:
        n = min(batch, n_examples - done)
        drys, mods, rates = [], [], []
        for i in range(n):
            a, file_sr = wav_read(files[(done + i) % len(files)])
            assert file_sr == SR
            start = int(rng.integers(0, a.shape[-1] - n_samples + 1))
            drys.append(a[0, start : start + n_samples])
            rate = float(rng.uniform(1.6, 1.9))
            m = np_make_mod_signal(
                n_samples, SR, rate, float(rng.uniform(0, 2 * np.pi)), "tri"
            )
            mods.append(make_quasi_periodic(rng, m))
            rates.append(rate)
        dry = np.stack(drys)[:, None, :]
        mod = np.stack(mods).astype(np.float32)
        wet_j = apply_flanger_chorus(
            jnp.asarray(dry), jnp.asarray(mod), SR,
            max_min_delay_ms=30.0, max_lfo_delay_ms=10.0,
            feedback=0.3, min_delay_width=min_delay_width, width=width,
            depth=1.0, mix=delay_mix,
        )
        if trem_mix > 0.0:
            # level-mod regime (chorus4): same LFO drives the gain
            wet_j = apply_tremolo(wet_j, jnp.asarray(mod), mix=trem_mix)
        wet = np.asarray(wet_j)
        mod_frames = mod[:, :: MOD_SIG_DIVISOR]
        for i in range(n):
            stem = os.path.join(out_dir, f"pair_{done + i:03d}")
            wav_write(f"{stem}_dry.wav", dry[i], SR)
            wav_write(f"{stem}_wet.wav", wet[i], SR)
            np.savez(
                f"{stem}.npz",
                mod_sig=mod_frames[i],
                fx_params={
                    "rate_hz": rates[i],
                    "shape": "tri",
                    "max_min_delay_ms": 30.0,
                    "max_lfo_delay_ms": 10.0,
                    "feedback": 0.3,
                    "min_delay_width": min_delay_width,
                    "width": width,
                    "depth": 1.0,
                    "mix": delay_mix,
                    "trem_mix": trem_mix,
                },
            )
        done += n
        print(f"{out_dir}: {done}/{n_examples}")


# (min_delay_width, width, default out dir, corpus seed, delay_mix,
# trem_mix) per regime; delay sweep = 10*width*mod + 30*min_delay_width ms
REGIMES = {
    "chorus": (0.367, 0.8, "data/sim_chorus_gt", 1007, 0.9, 0.0),   # 11-19 ms
    "chorus2": (0.167, 0.5, "data/sim_chorus2_gt", 1013, 0.9, 0.0),  # 5-10 ms
    # round 5: level-mod-dominant regime (delay mix 0.35 + tremolo 0.9
    # on the same LFO — make_sim_effect_data.py::sim_chorus4 rationale)
    "chorus4": (0.367, 0.8, "data/sim_chorus4_gt", 1019, 0.35, 0.9),
}


def main(argv) -> None:
    regime = _opt(argv, "--regime", "chorus")
    mdw, width, out_default, seed, delay_mix, trem_mix = REGIMES[regime]
    out_root = _opt(argv, "--out", out_default)
    n_train = _opt(argv, "--n-train", 256, int)
    n_val = _opt(argv, "--n-val", 96, int)
    n_samples = _opt(argv, "--n-samples", 88200, int)
    src_train = _opt(argv, "--src-train", "data/idmt_4/train")
    src_val = _opt(argv, "--src-val", "data/idmt_4/val")
    # seed disjoint from the EFFECT_SEEDS family; the regime (not the
    # draws) is what must match the shipped corpus
    rng = np.random.default_rng(seed)
    render_split(rng, src_train, os.path.join(out_root, "train"), n_train,
                 n_samples, min_delay_width=mdw, width=width,
                 delay_mix=delay_mix, trem_mix=trem_mix)
    render_split(rng, src_val, os.path.join(out_root, "val"), n_val,
                 n_samples, min_delay_width=mdw, width=width,
                 delay_mix=delay_mix, trem_mix=trem_mix)


if __name__ == "__main__":
    main(sys.argv[1:])
