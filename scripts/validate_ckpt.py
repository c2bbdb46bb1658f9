"""Validate a trained `models/<name>.yml` + checkpoint pair (reference
`scripts/validate_ckpt.py`).

Usage: `python scripts/validate_ckpt.py <models/name.yml> [ckpt_path]`.
The YAML is a full experiment config (our `configs/trained/` analog);
`ckpt_path` overrides the one recorded in the config.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig()
logging.getLogger().setLevel(os.environ.get("LOGLEVEL", "INFO"))

if __name__ == "__main__":
    import yaml

    from mod_extraction_tpu.cli import load_yaml_with_includes, validate

    model_name = sys.argv[1]
    cfg = load_yaml_with_includes(model_name)
    if len(sys.argv) > 2:
        cfg["ckpt_path"] = sys.argv[2]
    tmp = os.path.join("/tmp", "validate_ckpt_config.yml")
    with open(tmp, "w") as f:
        yaml.safe_dump(cfg, f)
    validate(tmp)
