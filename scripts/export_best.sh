#!/bin/bash
# Export a run's best checkpoint (falling back to `last` when the run
# never improved on a prior lineage best) to a bare models/*.npz.
# Usage: export_best.sh <run_name> <out_npz> [attr=model]
# Shared by the post-training chains so the best-vs-last selection
# policy lives in exactly one place.
set -e
cd "$(dirname "$0")/.."
RUN=$1; OUT=$2; ATTR=${3:-model}
CKPTS=out/${RUN}_ckpts
SRC=$CKPTS/last
[ -d "$CKPTS/best" ] && SRC=$CKPTS/best
echo "exporting $RUN from $SRC"
python scripts/extract_model_weights.py "$SRC" "$OUT" "$ATTR"
