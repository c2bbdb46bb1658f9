#!/bin/bash
# Stage-2 refresh after the r4 extractor chain (scripts/post_r4_evals.sh):
#   1. retrain the sim-chorus LSTM + rand baseline on the QUASIPERIODIC
#      chorus corpus (make_sim_effect_data.py regime change),
#   2. third sim-flanger fine-tune stage (ESR-weighted, npz warm start),
#   3. re-export the stage-2 npz weights, regenerate eval_em_sim.txt and
#      the model cards.
# Conditioning stays on the r3 extractor snapshot: the flanger/phaser
# LSTMs were trained against it and chorus keeps the suite consistent.
set -e
cd "$(dirname "$0")/.."

bash scripts/train_resumable.sh configs/train_em_sim_chorus.yml 120 60
bash scripts/train_resumable.sh configs/train_baseline_em_sim.yml 100 50
bash scripts/train_resumable.sh configs/train_em_sim_flanger_ft3.yml 80 40

for run in lstm_64__lfo_2dcnn_r3__sim_chorus rand_baseline__sim_chorus \
           lstm_64__lfo_2dcnn_r3__sim_flanger; do
  bash scripts/export_best.sh "$run" "models/${run}.npz" effect_model
done

python scripts/run_eval_grid.py --em-sim eval
python scripts/write_model_cards.py
echo "post-r4 stage-2 refresh complete"
