"""Run the full eval-config grid and archive the metric tables — the
analog of regenerating the reference's golden `eval/*.txt` files
(SURVEY.md §4: the archived tables ARE the de-facto regression suite).

Usage: python scripts/run_eval_grid.py [out_dir] [config ...]
Writes one `<config_name>.txt` per eval config; failures are recorded
in the file instead of aborting the grid.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_GRID = [
    "eval_lfo.yml",
    "eval_lfo_flanger.yml",
    "eval_lfo_chorus.yml",
    "eval_lfo_quasi.yml",
    "eval_lfo_distorted.yml",
    "eval_lfo_combined.yml",
    "eval_lfo_rand.yml",
    "eval_lfo_unseen_audio.yml",
    "eval_em_unseen_effect.yml",
]

if __name__ == "__main__":
    from mod_extraction_tpu.cli import validate
    from mod_extraction_tpu.evaluation.tables import format_validate_table
    from mod_extraction_tpu.paths import ensure_dir

    out_dir = ensure_dir(sys.argv[1] if len(sys.argv) > 1 else "out/eval")
    grid = sys.argv[2:] or DEFAULT_GRID
    for name in grid:
        target = os.path.join(out_dir, os.path.splitext(os.path.basename(name))[0] + ".txt")
        print(f"=== {name} -> {target}")
        try:
            metrics = validate(name)
            table = format_validate_table(
                {f"val/{k}": v for k, v in metrics.items()}
            )
        except Exception:
            table = f"FAILED:\n{traceback.format_exc()}"
        with open(target, "w") as f:
            f.write(table + "\n")
