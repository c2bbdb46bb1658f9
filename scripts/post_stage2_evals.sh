#!/bin/bash
# After the stage-2 queue (retrain_stage2_r3.sh): export the six effect
# models to models/*.npz, regenerate the full eval archive with the r3
# extractor, and refresh the model cards.  Sequential — each step needs
# the TPU to itself.
set -e
cd "$(dirname "$0")/.."

for eff in flanger chorus phaser; do
  python scripts/extract_model_weights.py \
    "out/lstm_64__lfo_2dcnn_r3__sim_${eff}_ckpts/best" \
    "models/lstm_64__lfo_2dcnn_r3__sim_${eff}.npz" effect_model
  python scripts/extract_model_weights.py \
    "out/rand_baseline__sim_${eff}_ckpts/best" \
    "models/rand_baseline__sim_${eff}.npz" effect_model
done

python scripts/run_eval_grid.py --per-shape eval \
  eval_lfo.yml eval_lfo_varying.yml eval_lfo_flanger.yml \
  eval_lfo_flanger_varying.yml eval_lfo_chorus.yml \
  eval_lfo_chorus_varying.yml eval_lfo_quasi.yml eval_lfo_distorted.yml \
  eval_lfo_combined.yml
python scripts/run_eval_grid.py --em-sim eval
python scripts/run_eval_grid.py --unseen-audio eval

python scripts/write_model_cards.py
echo "post-stage2 evals complete"
