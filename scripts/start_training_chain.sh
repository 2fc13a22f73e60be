#!/usr/bin/env bash
# Dependency-chained resubmission for long runs (the reference's SLURM chain,
# reference start_training_chain.sh:9-24, re-targeted at TPU queues).
# Each segment resumes from the previous run dir's checkpoints/last.
#
# Usage: start_training_chain.sh <n_segments> <run_root> [train.py overrides...]
set -euo pipefail
N=${1:?n_segments}; shift
RUN_ROOT=${1:?run_root}; shift
CKPT=""
for i in $(seq 1 "$N"); do
  OUT="$RUN_ROOT/segment_$i"
  echo ">>> segment $i/$N -> $OUT (resume: ${CKPT:-fresh})"
  if [ -n "$CKPT" ]; then
    python train.py "$@" ckpt_path="$CKPT" paths.log_dir="$OUT"
  else
    python train.py "$@" paths.log_dir="$OUT"
  fi
  LAST=$(ls -dt "$OUT"/train/runs/*/checkpoints/last 2>/dev/null | head -1)
  [ -n "$LAST" ] && CKPT="$LAST"
done
