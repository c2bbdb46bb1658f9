#!/bin/bash
# Train + export the six stage-2 sim-effect models (extractor-driven
# LSTM-64 and band-matched rand-LFO baseline per sim effect), then
# write the em-sim eval archive.  Run AFTER stage 1: the train configs'
# lfo_model_weights_path must point at the exported extractor npz, and
# run_eval_grid's lstm ckpt template must match the configs'
# model_name.
#
# Usage: scripts/run_stage2_sim.sh [lstm_epochs] [rand_epochs]
set -e
LSTM_EPOCHS=${1:-60}
RAND_EPOCHS=${2:-40}

run_name() {
  python - "$1" <<'PY'
import sys, yaml
c = yaml.safe_load(open(sys.argv[1]))["custom"]
print(f"{c['model_name']}__{c['dataset_name']}")
PY
}

train_and_export() {
  local cfg=$1 epochs=$2
  local run
  run=$(run_name "$cfg")
  bash scripts/train_resumable.sh "$cfg" "$epochs" "$epochs"
  python scripts/extract_model_weights.py \
    "out/${run}_ckpts/best" "models/${run}.npz" effect_model
}

for eff in chorus flanger phaser; do
  train_and_export "configs/train_em_sim_${eff}.yml" "$LSTM_EPOCHS"
done
for suffix in "" _flanger _phaser; do
  train_and_export "configs/train_baseline_em_sim${suffix}.yml" "$RAND_EPOCHS"
done

python scripts/run_eval_grid.py --em-sim eval
