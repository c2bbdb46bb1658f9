#!/bin/bash
# Full post-r5-training lineage orchestration (supersedes running
# post_r5_evals.sh + a separate r6 pass, which would regenerate the
# ~1h eval archive twice):
#
#   1. guard: ship r5 only if its best val/loss beats the SHIPPED r4
#      best (0.029684 — the r4 run's best checkpoint; the card's
#      final_val_metrics 0.0327 is the last epoch, not what exported)
#   2. export r5 npz + repoint the eval_lfo grid r4 -> r5 (cheap, so a
#      mid-chain interruption still leaves a shipped r5)
#   3. train r6 (second, lower-peak cosine restart; needs the r5 npz)
#   4. guard: ship r6 only if its best beats r5's best
#   5. ONE per-shape + unseen-audio archive regeneration against
#      whatever extractor won
#
# Model cards and the em-sim stage-2 migration run separately (they
# need REGISTRY entries / generated configs for the winning stem).
set -e
cd "$(dirname "$0")/.."

R4=lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r4
R5=lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r5
R6=lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r6
EVAL_CFGS="configs/eval_lfo.yml configs/eval_lfo_varying.yml \
  configs/eval_lfo_flanger.yml configs/eval_lfo_flanger_varying.yml \
  configs/eval_lfo_chorus.yml configs/eval_lfo_chorus_varying.yml \
  configs/eval_lfo_quasi.yml configs/eval_lfo_distorted.yml \
  configs/eval_lfo_combined.yml configs/eval_lfo_unseen_audio.yml"

# Best monitored val/loss for a run: prefer the run's live metrics
# jsonl; fall back to the shipped model card's best_val_loss so the
# chain stays resumable after out/ is wiped (a fresh host/round).
best_val() {
  python - "$1" <<'EOF'
import json, os, sys
run = sys.argv[1]
path = f"out/{run}_metrics.jsonl"
if os.path.exists(path):
    print(min(
        d["val/loss"]
        for d in map(json.loads, open(path))
        if d.get("phase") == "epoch" and "val/loss" in d
    ))
elif os.path.exists(f"models/{run}.yml"):
    import yaml
    print(yaml.safe_load(open(f"models/{run}.yml"))["best_val_loss"])
else:
    sys.exit(f"no out/ metrics and no shipped model card for {run} — "
             "train it first (scripts/train_resumable.sh)")
EOF
}

R5_BEST=$(best_val "$R5")
echo "r5 best val/loss: $R5_BEST (r4 shipped best: 0.029684)"
if [ -f "models/${R5}.npz" ]; then
  echo "r5 already shipped — skipping its guard/export"
else
  if ! python -c "import sys; sys.exit(0 if $R5_BEST < 0.029684 else 1)"; then
    echo "r5 did not beat r4 — keeping r4, skipping r6"
    exit 0
  fi
  bash scripts/export_best.sh "$R5" "models/${R5}.npz" model
  echo "r5 shipped"
fi
# idempotent repoint OUTSIDE the shipped-guard, so a run interrupted
# between export and sed still gets the eval grid repointed on resume
sed -i "s/${R4}\.npz/${R5}.npz/" $EVAL_CFGS

bash scripts/train_resumable.sh configs/train_lfo_interwoven_all_live_r6.yml 150 25

R6_BEST=$(best_val "$R6")
echo "r6 best val/loss: $R6_BEST (vs r5 $R5_BEST)"
if python -c "import sys; sys.exit(0 if $R6_BEST < $R5_BEST else 1)"; then
  bash scripts/export_best.sh "$R6" "models/${R6}.npz" model
  sed -i "s/${R5}\.npz/${R6}.npz/" $EVAL_CFGS
  echo "r6 shipped + eval grid repointed"
else
  echo "r6 did not beat r5 — keeping r5"
fi

python scripts/run_eval_grid.py --per-shape eval \
  eval_lfo.yml eval_lfo_varying.yml eval_lfo_flanger.yml \
  eval_lfo_flanger_varying.yml eval_lfo_chorus.yml \
  eval_lfo_chorus_varying.yml eval_lfo_quasi.yml eval_lfo_distorted.yml \
  eval_lfo_combined.yml
python scripts/run_eval_grid.py --unseen-audio eval
echo "extractor lineage chain complete"
