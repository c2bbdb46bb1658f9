#!/bin/bash
# Migrate the em-sim stage-2 suite's conditioning to the r4 extractor:
# warm-started low-LR adaptation runs for all three effects (the em-sim
# LSTM eval rows share one task, so the suite moves together), exports,
# eval_em_sim.yml repoint, table + card regeneration.
set -e
cd "$(dirname "$0")/.."

bash scripts/train_resumable.sh configs/train_em_sim_flanger_r4.yml 80 40
bash scripts/train_resumable.sh configs/train_em_sim_phaser_r4.yml 40 40
bash scripts/train_resumable.sh configs/train_em_sim_chorus_r4.yml 40 40

for run in lstm_64__lfo_2dcnn_r4__sim_flanger \
           lstm_64__lfo_2dcnn_r4__sim_phaser \
           lstm_64__lfo_2dcnn_r4__sim_chorus; do
  bash scripts/export_best.sh "$run" "models/${run}.npz" effect_model
done

sed -i \
  -e 's/lstm_64__lfo_2dcnn_r3__/lstm_64__lfo_2dcnn_r4__/' \
  -e 's/interwoven_idmt_all_live_r3\.npz/interwoven_idmt_all_live_r4.npz/' \
  configs/eval_em_sim.yml

python scripts/run_eval_grid.py --em-sim eval
python scripts/write_model_cards.py
echo "em-sim r4 migration complete"
