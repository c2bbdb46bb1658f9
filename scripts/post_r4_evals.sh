#!/bin/bash
# After the extractor continuation to 720 epochs: export the r4
# weights, point the eval_lfo grid at them (eval_em_sim stays on r3 —
# the stage-2 LSTMs were trained against the r3 snapshot), and
# regenerate the per-shape + unseen-audio archives and model cards.
set -e
cd "$(dirname "$0")/.."

# best/ only reappears if the continuation beats the pre-570 best_val
# recorded in meta.json (it was reset at the phaser-semantics change);
# otherwise export the final `last` state like the r3 export did.
bash scripts/export_best.sh lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live \
  models/lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r4.npz model

sed -i 's/interwoven_idmt_all_live_r3\.npz/interwoven_idmt_all_live_r4.npz/' \
  configs/eval_lfo.yml configs/eval_lfo_varying.yml \
  configs/eval_lfo_flanger.yml configs/eval_lfo_flanger_varying.yml \
  configs/eval_lfo_chorus.yml configs/eval_lfo_chorus_varying.yml \
  configs/eval_lfo_quasi.yml configs/eval_lfo_distorted.yml \
  configs/eval_lfo_combined.yml configs/eval_lfo_unseen_audio.yml

python scripts/run_eval_grid.py --per-shape eval \
  eval_lfo.yml eval_lfo_varying.yml eval_lfo_flanger.yml \
  eval_lfo_flanger_varying.yml eval_lfo_chorus.yml \
  eval_lfo_chorus_varying.yml eval_lfo_quasi.yml eval_lfo_distorted.yml \
  eval_lfo_combined.yml
python scripts/run_eval_grid.py --unseen-audio eval

python scripts/write_model_cards.py
echo "post-r4 evals complete"
