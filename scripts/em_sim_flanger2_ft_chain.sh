#!/bin/bash
# Protocol-matched cosine-restart fine-tune stage for the sim_flanger2
# pair (LSTM + rand baseline).  Exports/eval are done after inspecting
# which stage's best checkpoint wins (see ROUND_NOTES.md).
set -e
cd "$(dirname "$0")/.."

bash scripts/train_resumable.sh configs/train_em_sim_flanger2_ft.yml 60 30
bash scripts/train_resumable.sh configs/train_baseline_em_sim_flanger2_ft.yml 60 30
echo "flanger2 ft chain complete"
