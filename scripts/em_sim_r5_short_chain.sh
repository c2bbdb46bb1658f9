#!/bin/bash
# Shortened r5 em-sim migration (wall-clock-budgeted variant of
# em_sim_final_chain.sh): the warm-started runs open at r4-suite
# quality on epoch 0 (val/esr 0.2014 vs the shipped r4 flanger's
# 0.2033), so the adaptation budget is cut to 40/16/16/16 epochs
# (the configs' max_epochs were edited accordingly; those budgets are
# now the generator's defaults).  Does NOT rerun gen_em_sim_migration.py.
# NOTE: exports and the eval repoint run only after all four trainings —
# if interrupted mid-chain, re-run it (train_resumable resumes each
# completed run as a no-op).  Historical script: this ran for r5 in
# round 2; use em_sim_final_chain.sh for future migrations.
set -e
cd "$(dirname "$0")/.."
RN=r5

bash scripts/train_resumable.sh "configs/train_em_sim_flanger_${RN}.yml" 40 40
bash scripts/train_resumable.sh "configs/train_em_sim_phaser_${RN}.yml" 16 16
bash scripts/train_resumable.sh "configs/train_em_sim_chorus_${RN}.yml" 16 16
bash scripts/train_resumable.sh "configs/train_em_sim_flanger2_${RN}.yml" 16 16

for effect in flanger phaser chorus flanger2; do
  run="lstm_64__lfo_2dcnn_${RN}__sim_${effect}"
  bash scripts/export_best.sh "$run" "models/${run}.npz" effect_model
done

sed -i \
  -e "s/lstm_64__lfo_2dcnn_r4__/lstm_64__lfo_2dcnn_${RN}__/" \
  -e "s/interwoven_idmt_all_live_r4\.npz/interwoven_idmt_all_live_${RN}.npz/" \
  configs/eval_em_sim.yml

python scripts/run_eval_grid.py --em-sim eval
echo "em-sim ${RN} short migration complete"
