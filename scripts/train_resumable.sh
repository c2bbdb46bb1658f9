#!/bin/bash
# Chunked training: run `fit` a few epochs at a time in fresh processes,
# resuming from the `last` checkpoint each round.  Works around hosts
# whose TPU client leaks host->device transfer buffers (RSS grows with
# every step until the kernel OOM-kills long runs); on healthy hosts it
# is equivalent to one long run.
#
# Usage: scripts/train_resumable.sh <config> [total_epochs] [epochs_per_proc] [start_epoch]
# `start_epoch` skips the no-op chunks when continuing an existing run
# (each chunk process pays startup + checkpoint-restore even with no
# epochs left to train).
set -e
# persistent XLA compile cache: makes each chunk process reuse the
# previous chunks' compilations (no-op on backends that don't support it)
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
CFG=${1:?usage: train_resumable.sh <config> [total_epochs] [epochs_per_proc] [start_epoch]}
TOTAL=${2:-400}
CHUNK=${3:-8}
START=${4:-0}
# Preflight (VERDICT r3 #8): on a real TPU backend, run the quick Pallas
# parity gate once before committing hours of training — a Mosaic or
# runtime regression fails loudly here instead of silently corrupting
# the run.  Skipped on CPU backends (the gate only smoke-tests there)
# or with SKIP_PARITY_GATE=1.
if [ "${SKIP_PARITY_GATE:-0}" != "1" ]; then
  BACKEND=$(python -c "import jax; print(jax.default_backend())")
  if [ "$BACKEND" = "tpu" ]; then
    echo "[train_resumable] preflight: tpu_parity_gate --quick"
    # A remote-tunnel compile can wedge indefinitely (verify skill); a
    # HANG is environment flakiness — warn and continue.  A genuine
    # tolerance FAIL (nonzero, non-timeout) still aborts the chain.
    set +e
    timeout 900 python scripts/tpu_parity_gate.py --quick
    GATE_RC=$?
    set -e
    if [ "$GATE_RC" = "124" ]; then
      echo "[train_resumable] WARNING: parity gate timed out (tunnel" \
           "compile hang?) — continuing; run the full gate when idle"
    elif [ "$GATE_RC" != "0" ]; then
      echo "[train_resumable] parity gate FAILED (rc=$GATE_RC) — aborting"
      exit "$GATE_RC"
    fi
  fi
fi
for ((e = START + CHUNK; e <= TOTAL; e += CHUNK)); do
  python -c "from mod_extraction_tpu.cli import fit; fit('$CFG', resume=True, max_epochs=$e)"
done
