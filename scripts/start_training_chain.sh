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
# one persistent feature store for the WHOLE chain: every segment after the
# first warm-loads the frozen hub's pooled features from disk and trains at
# cached (steady-state) speed from its first step instead of re-paying the
# epoch-1 hub cost per segment (train/feature_cache.py:DiskFeatureStore)
FEAT="$RUN_ROOT/feature_cache"
for i in $(seq 1 "$N"); do
  OUT="$RUN_ROOT/segment_$i"
  echo ">>> segment $i/$N -> $OUT (resume: ${CKPT:-fresh})"
  if [ -n "$CKPT" ]; then
    python train.py "$@" ckpt_path="$CKPT" paths.log_dir="$OUT" \
      trainer.cache_persist_dir="$FEAT"
  else
    python train.py "$@" paths.log_dir="$OUT" \
      trainer.cache_persist_dir="$FEAT"
  fi
  LAST=$(ls -dt "$OUT"/train/runs/*/checkpoints/last 2>/dev/null | head -1)
  [ -n "$LAST" ] && CKPT="$LAST"
done
