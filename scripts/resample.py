"""One-off resample of a directory of wavs (reference `scripts/resample.py`).

Usage: python scripts/resample.py <in_dir> <out_dir> <new_sr>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mod_extraction_tpu.data.wav import wav_read, wav_write
from mod_extraction_tpu.ops.resample import resample

if __name__ == "__main__":
    in_dir, out_dir, new_sr = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(os.listdir(in_dir)):
        if not name.endswith(".wav") or name.startswith("."):
            continue
        audio, sr = wav_read(os.path.join(in_dir, name))
        wav_write(os.path.join(out_dir, name), resample(audio, sr, new_sr), new_sr)
        print(f"{name}: {sr} -> {new_sr}")
