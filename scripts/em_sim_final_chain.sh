#!/bin/bash
# Migrate the em-sim stage-2 suite's conditioning to the final
# round-2 extractor (r5 or r6, whichever extractor_r5_r6_chain.sh
# shipped): generate the migration configs, run the four warm-started
# low-LR adaptations, export each run's best, repoint eval_em_sim.yml,
# regenerate the em-sim table.
# Usage: em_sim_final_chain.sh <rN>   (e.g. r6)
set -e
cd "$(dirname "$0")/.."
RN=${1:?usage: em_sim_final_chain.sh <rN>}

# skip the generator when the configs already exist (a resumed chain
# must not regenerate them — that would reset any hand-tuned budgets)
if [ ! -f "configs/train_em_sim_flanger_${RN}.yml" ]; then
  python scripts/gen_em_sim_migration.py "$RN"
fi

# train-then-export per effect, budgets read from the generated
# configs, so an interruption leaves every completed run exported
for effect in flanger phaser chorus flanger2 chorus2 chorus3 chorus4; do
  cfg="configs/train_em_sim_${effect}_${RN}.yml"
  total=$(grep -o 'max_epochs: [0-9]*' "$cfg" | head -1 | grep -o '[0-9]*')
  bash scripts/train_resumable.sh "$cfg" "$total" "$total"
  run="lstm_64__lfo_2dcnn_${RN}__sim_${effect}"
  bash scripts/export_best.sh "$run" "models/${run}.npz" effect_model
done

sed -i \
  -e "s/lstm_64__lfo_2dcnn_r[0-9]*__/lstm_64__lfo_2dcnn_${RN}__/" \
  -e "s/interwoven_idmt_all_live_r[0-9]*\.npz/interwoven_idmt_all_live_${RN}.npz/" \
  configs/eval_em_sim.yml

python scripts/run_eval_grid.py --em-sim eval
echo "em-sim ${RN} migration complete"
