#!/bin/bash
# Add the sim_flanger2 (phase-critical resonant flanger) block to the
# em-sim suite: protocol-matched LSTM + rand-baseline trainings, exports,
# table + card regeneration.
set -e
cd "$(dirname "$0")/.."

# regenerate the corpus if a fresh host lost data/ (seed pinned in
# make_sim_effect_data.py EFFECT_SEEDS — reproduces the shipped pairs)
[ -d data/sim_flanger2/train/dry ] || python scripts/make_sim_effect_data.py sim_flanger2

bash scripts/train_resumable.sh configs/train_em_sim_flanger2.yml 120 40
bash scripts/train_resumable.sh configs/train_baseline_em_sim_flanger2.yml 120 40

for run in lstm_64__lfo_2dcnn_r4__sim_flanger2 rand_baseline__sim_flanger2; do
  bash scripts/export_best.sh "$run" "models/${run}.npz" effect_model
done

python scripts/run_eval_grid.py --em-sim eval
python scripts/write_model_cards.py
echo "sim_flanger2 chain complete"
