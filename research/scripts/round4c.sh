#!/bin/bash
# Round-4 tail orchestrator: idles until the headline_rl_ref chain exits,
# then regenerates BENCH_MATRIX.json at HEAD (incl. the v2 contact envs and
# the solver-exit rows) and runs round4b (Bounce table, RSSM/Dropbox FVD
# redo, final table render, SAC). Survives builder-session restarts.
# Usage: round4c.sh <REF_CHAIN_PID> <DEADLINE_EPOCH>
set -uo pipefail
REF_PID=${1:?ref chain pid}
DEADLINE=${2:?deadline epoch}
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== waiting for ref chain (pid $REF_PID) $(date)"
while kill -0 "$REF_PID" 2>/dev/null; do sleep 30; done
echo "=== ref chain exited $(date)"

remain=$(( DEADLINE - $(date +%s) ))
if [ "$remain" -gt 1200 ]; then
  echo "=== bench matrix @HEAD (${remain}s left)"
  BENCH_MATRIX=1 timeout 3600 python bench.py 2>&1 | tail -30
else
  echo "=== skip bench matrix: ${remain}s left"
fi

bash research/scripts/round4b.sh "$DEADLINE"
echo "=== round4c done $(date)"
