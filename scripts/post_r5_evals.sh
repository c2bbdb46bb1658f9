#!/bin/bash
# After the r5 cosine-restart anneal (train_lfo_interwoven_all_live_r5.yml):
# ship it ONLY if its best val/loss beats the SHIPPED r4 npz — the r4
# run's best checkpoint, val/loss 0.029684 (out/..._live_ckpts/meta.json
# best_val; the card's final_val_metrics 0.0327 is the last epoch, not
# what was exported) — then repoint the eval_lfo grid
# and regenerate the per-shape + unseen-audio archives and model cards.
set -e
cd "$(dirname "$0")/.."

RUN=lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r5
if ! python - <<'EOF'
import json, sys
best = min(
    d["val/loss"]
    for d in map(json.loads, open("out/lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r5_metrics.jsonl"))
    if d.get("phase") == "epoch" and "val/loss" in d
)
print(f"r5 best val/loss: {best:.6f} (r4 shipped best: 0.029684)")
sys.exit(0 if best < 0.029684 else 1)
EOF
then
  echo "r5 did not beat r4 — not shipping"
  exit 0
fi

bash scripts/export_best.sh "$RUN" "models/${RUN}.npz" model

sed -i 's/interwoven_idmt_all_live_r4\.npz/interwoven_idmt_all_live_r5.npz/' \
  configs/eval_lfo.yml configs/eval_lfo_varying.yml \
  configs/eval_lfo_flanger.yml configs/eval_lfo_flanger_varying.yml \
  configs/eval_lfo_chorus.yml configs/eval_lfo_chorus_varying.yml \
  configs/eval_lfo_quasi.yml configs/eval_lfo_distorted.yml \
  configs/eval_lfo_combined.yml configs/eval_lfo_unseen_audio.yml

python scripts/run_eval_grid.py --per-shape eval \
  eval_lfo.yml eval_lfo_varying.yml eval_lfo_flanger.yml \
  eval_lfo_flanger_varying.yml eval_lfo_chorus.yml \
  eval_lfo_chorus_varying.yml eval_lfo_quasi.yml eval_lfo_distorted.yml \
  eval_lfo_combined.yml
python scripts/run_eval_grid.py --unseen-audio eval

python scripts/write_model_cards.py
echo "post-r5 evals complete"
