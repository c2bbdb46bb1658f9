#!/bin/bash
# Round-4 chorus-conditioning-win experiment (VERDICT r3 next #5): the
# 11-19 ms sim_chorus regime saturates LSTM-64 (GT control == rand), so
# render the SHORT-delay sim_chorus2 regime (5-10 ms sweep) and train
# the full conditioning bracket — extractor-conditioned LSTM, rand
# baseline, and GT control — then regenerate the em-sim archive.
# Target: extractor esr <= 0.8x rand (the reference's EGFx chorus win is
# 0.72x, eval_em_unseen_effect.txt:59), GT control bracketing below.
#
# TPU-hours: ~3 trainings x 100 epochs at batch 32 (each ~30-45 min) +
# corpus renders + eval regen.  Resumable: re-run after interruption.
set -e
cd "$(dirname "$0")/.."

# 1. corpora (skipped when already rendered)
[ -d data/sim_chorus2/train/dry ] || \
  python scripts/make_sim_effect_data.py sim_chorus2
[ -d data/sim_chorus2_gt/train ] || \
  python scripts/make_sim_chorus_gt_control.py --regime chorus2

# 2. the conditioning bracket
bash scripts/train_resumable.sh configs/train_em_sim_chorus2.yml 100 25
bash scripts/train_resumable.sh configs/train_baseline_em_sim_chorus2.yml 100 25
bash scripts/train_resumable.sh configs/train_em_sim_chorus2_gtctrl.yml 100 25

# 3. exports
bash scripts/export_best.sh lstm_64__lfo_2dcnn_r6__sim_chorus2 \
  models/lstm_64__lfo_2dcnn_r6__sim_chorus2.npz effect_model
bash scripts/export_best.sh rand_baseline__sim_chorus2 \
  models/rand_baseline__sim_chorus2.npz effect_model
bash scripts/export_best.sh lstm_64__gt_mod_sig__sim_chorus2_gt \
  models/lstm_64__gt_mod_sig__sim_chorus2_gt.npz effect_model

# 4. archive + cards
python scripts/run_eval_grid.py --em-sim eval
python scripts/write_model_cards.py
echo "sim_chorus2 chain complete"
