#!/bin/bash
# Add the sim_flanger2 (phase-critical resonant flanger) block to the
# em-sim suite: protocol-matched LSTM + rand-baseline trainings, exports,
# table + card regeneration.
set -e
cd "$(dirname "$0")/.."

bash scripts/train_resumable.sh configs/train_em_sim_flanger2.yml 120 40
bash scripts/train_resumable.sh configs/train_baseline_em_sim_flanger2.yml 120 40

for run in lstm_64__lfo_2dcnn_r4__sim_flanger2 rand_baseline__sim_flanger2; do
  SRC=out/${run}_ckpts/last
  [ -d "out/${run}_ckpts/best" ] && SRC=out/${run}_ckpts/best
  echo "exporting $run from $SRC"
  python scripts/extract_model_weights.py "$SRC" "models/${run}.npz" effect_model
done

python scripts/run_eval_grid.py --em-sim eval
python scripts/write_model_cards.py
echo "sim_flanger2 chain complete"
