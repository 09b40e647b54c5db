#!/bin/bash
# Round-5 queue-driven orchestrator: runs stage scripts from
# research/scripts/r5/ in filename order, one at a time (one JAX process at
# a time — CLAUDE.md). Stages can be added/edited while it runs; each stage
# is resume-aware and commits its own durable artifacts into logs/evidence/.
# A stage decides for itself whether it still fits its deadline
# (R5_TPU_DEADLINE for TPU-touching work, R5_HARD_END for the CPU tail).
# Usage: round5_runner.sh <TPU_DEADLINE_EPOCH> <HARD_END_EPOCH>
set -uo pipefail
export R5_TPU_DEADLINE=${1:?tpu deadline epoch}
export R5_HARD_END=${2:?hard end epoch}
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
Q=research/scripts/r5
RUN=logs/r5q
mkdir -p "$RUN/done" logs/evidence

while [ "$(date +%s)" -lt "$R5_HARD_END" ]; do
  [ -f "$RUN/STOP" ] && { echo "=== STOP file; runner exiting"; break; }
  next=""
  for s in "$Q"/*.sh; do
    [ -e "$s" ] || continue
    b=$(basename "$s")
    [ -f "$RUN/done/$b" ] && continue
    next="$s"; break
  done
  if [ -z "$next" ]; then
    sleep 60
    continue
  fi
  b=$(basename "$next")
  echo "=== runner: start $b $(date)"
  bash "$next" > "$RUN/log_${b%.sh}.log" 2>&1
  rc=$?
  echo "$rc $(date)" > "$RUN/done/$b"
  echo "=== runner: done $b rc=$rc $(date)"
done
echo "=== runner exit $(date)"
