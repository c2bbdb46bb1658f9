#!/bin/bash
# r7 extractor stage: exponent-augmentation anneal from r6
# (configs/train_lfo_interwoven_all_live_r7.yml), gated on the EVAL
# GRID rather than val/loss (the r7 val distribution is augmented, so
# best-val is not comparable to r6's — see the config header).
#
# Ship gate: fl-distorted-all val/l1 <= 0.0670 (the reference archive
# row r6 does not beat) AND the in-domain eval_lfo all-shapes val/l1
# within 5% of the r6 archive (0.010751) — i.e. the augmentation must
# close the distorted gap without costing the in-domain headline.
# On pass: repoint the 10 eval configs to r7 + regenerate the archives
# (the r6-chain recipe).  On fail: keep r6 and print the numbers for
# ROUND_NOTES (documented negative result).
set -e
cd "$(dirname "$0")/.."

R6=lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r6
R7=lfo_2dcnn_io_sa_25_25_no_ch_ln__interwoven_idmt_all_live_r7
EVAL_CFGS="configs/eval_lfo.yml configs/eval_lfo_varying.yml \
configs/eval_lfo_flanger.yml configs/eval_lfo_flanger_varying.yml \
configs/eval_lfo_chorus.yml configs/eval_lfo_chorus_varying.yml \
configs/eval_lfo_quasi.yml configs/eval_lfo_distorted.yml \
configs/eval_lfo_combined.yml configs/eval_lfo_unseen_audio.yml"

bash scripts/train_resumable.sh configs/train_lfo_interwoven_all_live_r7.yml 150 25
bash scripts/export_best.sh "$R7" "models/${R7}.npz" model

# candidate evals via /tmp copies — the committed configs stay on r6
# until the gate passes
mkdir -p /tmp/r7gate
for c in eval_lfo_distorted eval_lfo; do
  sed "s/${R6}\.npz/${R7}.npz/" "configs/${c}.yml" > "/tmp/r7gate/${c}.yml"
done

# NOTE: validate() prints its metric table to stdout, so keep only the
# final line (the bare number) — capturing everything feeds the table
# into the arithmetic gate below
DIST_L1=$(python - <<'EOF' | tail -1
from mod_extraction_tpu.cli import validate
print(f"{validate('/tmp/r7gate/eval_lfo_distorted.yml')['l1']:.6f}")
EOF
)
BASE_L1=$(python - <<'EOF' | tail -1
from mod_extraction_tpu.cli import validate
print(f"{validate('/tmp/r7gate/eval_lfo.yml')['l1']:.6f}")
EOF
)
echo "r7 gate: fl-distorted-all val/l1=${DIST_L1} (need <= 0.0670), " \
     "eval_lfo all val/l1=${BASE_L1} (need <= 0.011289 = 1.05 * r6)"

if python -c "import sys; sys.exit(0 if (${DIST_L1} <= 0.0670 and ${BASE_L1} <= 0.011289) else 1)"; then
  echo "r7 PASSES the gate — repointing the eval grid + regenerating"
  sed -i "s/${R6}\.npz/${R7}.npz/" $EVAL_CFGS
  python scripts/write_model_cards.py
  python scripts/run_eval_grid.py --per-shape eval \
    eval_lfo.yml eval_lfo_varying.yml eval_lfo_flanger.yml \
    eval_lfo_flanger_varying.yml eval_lfo_chorus.yml \
    eval_lfo_chorus_varying.yml eval_lfo_quasi.yml eval_lfo_distorted.yml \
    eval_lfo_combined.yml
  python scripts/run_eval_grid.py --unseen-audio eval
  echo "r7 shipped"
else
  echo "r7 FAILS the gate — keeping r6 (document the numbers in ROUND_NOTES)"
fi
echo "r7 chain complete"
