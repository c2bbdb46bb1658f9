#!/bin/bash
# After post_stage2_evals.sh: fine-tune the sim-flanger LSTM for 80 more
# epochs at lr 3e-5 (hunting the <=0.5x rand-baseline conditioning win),
# re-export its best weights, and refresh the em-sim eval archive + card.
set -e
cd "$(dirname "$0")/.."

bash scripts/train_resumable.sh configs/train_em_sim_flanger_ft.yml 200 40 120

python scripts/extract_model_weights.py \
  out/lstm_64__lfo_2dcnn_r3__sim_flanger_ckpts/best \
  models/lstm_64__lfo_2dcnn_r3__sim_flanger.npz effect_model
python scripts/run_eval_grid.py --em-sim eval
python scripts/write_model_cards.py
echo "flanger ft + eval complete"
