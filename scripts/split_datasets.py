"""Dataset preparation (reference `scripts/split_datasets.py`):

* `split_idmt_4`: song-level 75/25 train/val split of IDMT-SMT-Guitar
  dataset 4, trimming the first `offset_n_bars` bars using the BPM
  parsed from each filename.
* `split_egfx`: 70/18/12 train/val/test split of the EGFx dataset with
  resampling to 44.1 kHz; the same file-name split is applied to every
  effect subdirectory so dry/wet pairs stay aligned.

Usage:
  python scripts/split_datasets.py idmt <root_dir>
  python scripts/split_datasets.py egfx <root_dir>
"""

import os
import random
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mod_extraction_tpu.data.wav import wav_info, wav_read, wav_write
from mod_extraction_tpu.ops.resample import resample

IDMT_SOURCES = ["acoustic_mic", "acoustic_pickup", "Career SG", "Ibanez 2820"]


def _wavs_under(root: str):
    out = []
    for r, _, files in os.walk(root):
        for f in files:
            if f.endswith(".wav") and not f.startswith("."):
                out.append(os.path.join(r, f))
    return sorted(out)


def split_idmt_4(root_dir: str, val_split: float = 0.25, offset_n_bars: int = 3,
                 seed: int = 42) -> None:
    random.seed(seed)
    train_dir = os.path.join(root_dir, "train")
    val_dir = os.path.join(root_dir, "val")
    os.makedirs(train_dir)
    os.makedirs(val_dir)

    song_names: set = set()
    val_names: list = []
    for source in IDMT_SOURCES:
        paths = _wavs_under(os.path.join(root_dir, source))
        if not song_names and len(paths) == 128:
            for p in paths:
                tokens = os.path.basename(p).split("_")
                song_names.add("_".join(tokens[:2]))
        assert len(song_names) == 64, f"unexpected song count: {len(song_names)}"
        if not val_names:
            val_names = random.sample(sorted(song_names),
                                      int(val_split * len(song_names)))
        for src in paths:
            name = os.path.basename(src)
            bpm = int(name.split("_")[-1][:-7])  # "<bpm>bpm.wav"
            assert 50 <= bpm <= 200, f"bad bpm: {bpm} in {name}"
            audio, sr = wav_read(src)
            # trim offset_n_bars of 4/4 at the parsed tempo
            offset = int(4.0 * 60.0 / bpm * offset_n_bars * sr)
            audio = audio[:, offset:]
            dest = val_dir if any(v in name for v in val_names) else train_dir
            wav_write(os.path.join(dest, f"{source}__{name}"), audio, sr)
            print(f"{src} -> {dest}")


def split_egfx(root_dir: str, val_split: float = 0.18, test_split: float = 0.12,
               new_sr: int = 44100, seed: int = 42) -> None:
    random.seed(seed)
    splits = {s: os.path.join(root_dir, s) for s in ("train", "val", "test")}
    for d in splits.values():
        os.makedirs(d)

    split_names = None
    for dir_name in sorted(os.listdir(root_dir)):
        src_dir = os.path.join(root_dir, dir_name)
        if not os.path.isdir(src_dir) or dir_name in splits:
            continue
        if split_names is None:
            names = sorted(
                n for n in os.listdir(src_dir)
                if n.endswith(".wav") and not n.startswith(".")
            )
            val = random.sample(names, int(val_split * len(names)))
            rest = [n for n in names if n not in val]
            test = random.sample(rest, int(test_split * len(names)))
            train = [n for n in rest if n not in test]
            split_names = {"train": train, "val": val, "test": test}
        for split, names in split_names.items():
            dest_dir = os.path.join(splits[split], dir_name)
            os.makedirs(dest_dir, exist_ok=True)
            for n in names:
                src = os.path.join(src_dir, n)
                dest = os.path.join(dest_dir, n)
                sr = wav_info(src).sample_rate
                if sr != new_sr:
                    audio, sr = wav_read(src)
                    wav_write(dest, resample(audio, sr, new_sr), new_sr)
                else:
                    shutil.copyfile(src, dest)
        print(f"split {dir_name}")


if __name__ == "__main__":
    kind, root = sys.argv[1], sys.argv[2]
    if kind == "idmt":
        split_idmt_4(root)
    elif kind == "egfx":
        split_egfx(root)
    else:
        raise SystemExit(f"unknown dataset kind: {kind}")
