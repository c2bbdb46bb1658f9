"""Synthesize a clean-guitar-like training corpus (stand-in for
IDMT-SMT-Guitar, which does not ship with the reference either —
`README.md` step 2 tells users to download it).

Karplus-Strong plucked strings arranged in random riffs: harmonically
rich, transient, with natural decay and occasional rests — the signal
statistics the LFO extractor's training data pipeline expects
(non-silent chunks survive `silence_threshold_energy: 1e-4`, reference
`configs/train_lfo_phaser.yml`).  Deterministic per file index, so the
corpus is reproducible from this script alone.

Filenames end `_<bpm>bpm.wav` to satisfy the idmt split convention
(`scripts/split_datasets.py`, reference `split_idmt_4` parses BPM from
the name).

Usage:
  python scripts/make_synthetic_corpus.py [out_root] [n_train] [n_val] [dur_s]
Defaults: data/idmt_4 32 8 12.0
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mod_extraction_tpu.data.wav import wav_write

SR = 44100
# E-standard guitar fretboard, lowest octave-and-a-bit (Hz)
_E2 = 82.41
SEMITONE = 2.0 ** (1.0 / 12.0)


def karplus_strong(
    rng: np.random.Generator, freq: float, n: int, damp: float
) -> np.ndarray:
    """Plucked string: noise burst through the KS averaging loop."""
    period = max(2, int(round(SR / freq)))
    buf = rng.uniform(-1.0, 1.0, period).astype(np.float64)
    out = np.empty(n)
    # vectorize per period block: y[t] = damp * 0.5 * (y[t-p] + y[t-p-1])
    prev_last = buf[-1]
    pos = 0
    while pos < n:
        take = min(period, n - pos)
        prev = np.concatenate(([prev_last], buf[:-1]))
        buf = damp * 0.5 * (buf + prev)
        out[pos : pos + take] = buf[:take]
        prev_last = buf[-1]
        pos += take
    return out


def render_riff(rng: np.random.Generator, n_samples: int, bpm: int) -> np.ndarray:
    """Random pentatonic riff with rests; soft-clipped body resonance."""
    out = np.zeros(n_samples + SR)
    beat = 60.0 / bpm
    # random pentatonic scale rooted in the low register
    root = _E2 * SEMITONE ** rng.integers(0, 12)
    scale = [0, 3, 5, 7, 10, 12, 15, 17]
    t = rng.uniform(0.0, 0.5) * beat
    while t * SR < n_samples:
        dur_beats = rng.choice([0.5, 0.5, 1.0, 1.0, 2.0])
        if rng.uniform() < 0.12:  # rest
            t += dur_beats * beat
            continue
        n_notes = 2 if rng.uniform() < 0.25 else 1  # occasional double-stop
        for _ in range(n_notes):
            freq = root * SEMITONE ** rng.choice(scale)
            dur = dur_beats * beat * rng.uniform(1.0, 1.8)  # let notes ring
            n = int(dur * SR)
            damp = rng.uniform(0.994, 0.999)
            note = karplus_strong(rng, freq, n, damp)
            note *= rng.uniform(0.4, 0.9) * np.exp(-np.arange(n) / (dur * SR))
            i = int(t * SR)
            out[i : i + n] += note[: max(0, len(out) - i)]
        t += dur_beats * beat
    out = out[:n_samples]
    out = np.tanh(1.5 * out)  # gentle body/amp saturation
    peak = np.abs(out).max()
    return (0.7 * out / max(peak, 1e-6)).astype(np.float32)


def render_pads(rng: np.random.Generator, n_samples: int, bpm: int) -> np.ndarray:
    """Sustained additive-synthesis chords (vocal/pad-like): slow attacks,
    steady harmonics, slight detune shimmer — spectral statistics far from
    the plucked KS riffs, for the UNSEEN-AUDIO generalization eval
    (reference uses MedleyDB/VocalSet there)."""
    out = np.zeros(n_samples)
    bar = 4 * 60.0 / bpm
    t_axis = np.arange(n_samples) / SR
    t = 0.0
    while t < n_samples / SR:
        dur = bar * rng.choice([1.0, 1.0, 2.0])
        root = 110.0 * SEMITONE ** rng.integers(0, 24)
        intervals = rng.choice([0, 3, 4, 7, 10, 12], rng.integers(3, 6),
                               replace=False)
        seg = np.zeros(n_samples)
        for iv in intervals:
            f0 = root * SEMITONE ** iv
            for h in range(1, 9):
                if f0 * h > 0.45 * SR:
                    break
                detune = 1.0 + rng.normal(0.0, 3e-4)
                amp = rng.uniform(0.5, 1.0) / h**1.5
                ph = rng.uniform(0, 2 * np.pi)
                seg += amp * np.sin(2 * np.pi * f0 * h * detune * t_axis + ph)
        # slow attack/release envelope gated to [t, t+dur]
        env = np.clip((t_axis - t) / 0.4, 0, 1) * np.clip((t + dur - t_axis) / 0.6, 0, 1)
        out += seg * np.clip(env, 0, 1) * rng.uniform(0.2, 0.5)
        t += dur
    peak = np.abs(out).max()
    return (0.7 * out / max(peak, 1e-6)).astype(np.float32)


STYLES = {"riffs": render_riff, "pads": render_pads}


def main() -> None:
    argv = list(sys.argv[1:])
    style = "riffs"
    if "--style" in argv:
        i = argv.index("--style")
        style = argv[i + 1]
        del argv[i : i + 2]
    render = STYLES[style]
    out_root = argv[0] if len(argv) > 0 else "data/idmt_4"
    n_train = int(argv[1]) if len(argv) > 1 else 32
    n_val = int(argv[2]) if len(argv) > 2 else 8
    dur_s = float(argv[3]) if len(argv) > 3 else 12.0
    n_samples = int(dur_s * SR)
    for split, count, seed0 in (("train", n_train, 1000), ("val", n_val, 2000)):
        if count <= 0:
            continue
        d = os.path.join(out_root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            rng = np.random.default_rng(seed0 + i)
            bpm = int(rng.choice([80, 95, 100, 110, 120, 130, 140]))
            audio = render(rng, n_samples, bpm)
            wav_write(
                os.path.join(d, f"{style}_{seed0 + i}_{bpm}bpm.wav"), audio, SR
            )
        print(f"{split} [{style}]: {count} files x {dur_s:.1f}s -> {d}")


if __name__ == "__main__":
    main()
