#!/bin/bash
# Round-5 chorus workstream (VERDICT r4 next #4 + #6):
#   1. sim_chorus4 — the level-mod-DOMINANT regime the round-4
#      five-bracket analysis prescribes; train the LSTM/rand/GT triple.
#      Target: conditioned/rand eval esr <= 0.8x, GT bracketing below.
#   2. sim_chorus3 seed-2 replication — re-run the exact r4 recipe at
#      seed 45; the ~0.0085-esr separation is load-bearing only if both
#      seeds show conditioned < rand.
# Then export the five models, regenerate the em-sim archive (the new
# chorus4 / gt-control / s2-replication blocks activate on ckpt
# availability), and refresh cards.  Resumable: re-run after
# interruption.  ~5 trainings x 40 epochs at batch 32.
set -e
cd "$(dirname "$0")/.."

# 1. corpora (skipped when already rendered)
[ -d data/sim_chorus4/train/dry ] || \
  python scripts/make_sim_effect_data.py sim_chorus4
[ -d data/sim_chorus4_gt/train ] || \
  python scripts/make_sim_chorus_gt_control.py --regime chorus4

# 2. the chorus4 conditioning bracket + the chorus3 seed replication
bash scripts/train_resumable.sh configs/train_em_sim_chorus4.yml 40 40
bash scripts/train_resumable.sh configs/train_baseline_em_sim_chorus4.yml 40 40
bash scripts/train_resumable.sh configs/train_em_sim_chorus4_gtctrl.yml 40 40
bash scripts/train_resumable.sh configs/train_em_sim_chorus3_s2.yml 40 40
bash scripts/train_resumable.sh configs/train_baseline_em_sim_chorus3_s2.yml 40 40

# 3. exports
bash scripts/export_best.sh lstm_64__lfo_2dcnn_r6__sim_chorus4 \
  models/lstm_64__lfo_2dcnn_r6__sim_chorus4.npz effect_model
bash scripts/export_best.sh rand_baseline__sim_chorus4 \
  models/rand_baseline__sim_chorus4.npz effect_model
bash scripts/export_best.sh lstm_64__gt_mod_sig__sim_chorus4_gt \
  models/lstm_64__gt_mod_sig__sim_chorus4_gt.npz effect_model
bash scripts/export_best.sh lstm_64__lfo_2dcnn_r6__sim_chorus3_s2 \
  models/lstm_64__lfo_2dcnn_r6__sim_chorus3_s2.npz effect_model
bash scripts/export_best.sh rand_baseline__sim_chorus3_s2 \
  models/rand_baseline__sim_chorus3_s2.npz effect_model

# 4. archive + cards
python scripts/run_eval_grid.py --em-sim eval
python scripts/write_model_cards.py
echo "round5 chorus chain complete"
