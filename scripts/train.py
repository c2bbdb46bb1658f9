"""Training entry point (reference `scripts/train.py`).

Usage: `python scripts/train.py [config]` — the config may also be picked
by editing `config_name` below, mirroring the reference's workflow.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig()
logging.getLogger().setLevel(os.environ.get("LOGLEVEL", "INFO"))

# Pick an experiment (un)comment-style, as in the reference:
config_name = "train_lfo_phaser.yml"
# config_name = "train_lfo_flanger.yml"
# config_name = "train_lfo_interwoven_all.yml"
# config_name = "train_em_dry_wet.yml"
# config_name = "train_baseline_em_dry_wet.yml"

if __name__ == "__main__":
    from mod_extraction_tpu.cli import fit

    cfg = sys.argv[1] if len(sys.argv) > 1 else config_name
    fit(cfg)
