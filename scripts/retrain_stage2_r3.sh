#!/bin/bash
# Round-2 stage-2 retraining queue (run AFTER the r3 extractor export and
# the configs' r2->r3 rename): regenerates the three sim-effect corpora
# with the JUCE-pinned phaser + milder flanger/chorus regimes, then
# trains the three extractor-conditioned LSTM-64 models and their three
# band-matched RandomLFO baselines, sequentially on the one chip.
# Everything goes through train_resumable.sh, so a killed run continues
# from `last`.
set -e
cd "$(dirname "$0")/.."

python scripts/make_sim_effect_data.py

for eff in flanger chorus phaser; do
  bash scripts/train_resumable.sh "configs/train_em_sim_${eff}.yml" 120 30 0
done
for cfg in train_baseline_em_sim_flanger.yml train_baseline_em_sim.yml train_baseline_em_sim_phaser.yml; do
  bash scripts/train_resumable.sh "configs/${cfg}" 40 20 0
done
echo "stage-2 queue complete"
