"""Evaluation entry point (reference `scripts/validate.py`): runs a
pinned-seed eval config and prints the metric table in the archived
`eval/*.txt` format."""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig()
logging.getLogger().setLevel(os.environ.get("LOGLEVEL", "INFO"))

config_name = "eval_lfo.yml"
# config_name = "eval_lfo_quasi.yml"
# config_name = "eval_lfo_distorted.yml"
# config_name = "eval_lfo_combined.yml"
# config_name = "eval_lfo_rand.yml"
# config_name = "eval_lfo_unseen_audio.yml"
# config_name = "eval_em_unseen_effect.yml"

if __name__ == "__main__":
    from mod_extraction_tpu.cli import validate

    cfg = sys.argv[1] if len(sys.argv) > 1 else config_name
    validate(cfg)
