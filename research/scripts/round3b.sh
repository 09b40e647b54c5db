#!/bin/bash
# Round-3 evidence chain, deadline-aware relaunch (supersedes
# round3_tables.sh + /tmp/follow_on.sh after the Dropbox RSSM eval OOM):
#   1. model-quality table (VERDICT #6) — env order puts the headline envs
#      (Urchin, Luxo) before Bounce so a deadline cut costs the least
#   2. solver-iteration A/B (VERDICT #4) — the 8/4 arm is the mtable Urchin
#      FBT cell (identical flags), symlinked instead of recomputed
#   3. Urchin RL headline (BASELINE rows 3-4) — reuses the mtable Urchin
#      dataset + BVAE
# Every stage runs in its own process group and is killed at DEADLINE so
# the driver's bench.py gets the TPU back. One JAX process at a time.
# Usage: round3b.sh <DEADLINE_EPOCH>
set -uo pipefail
cd "$(dirname "$0")/../.."
DEADLINE=${1:?deadline epoch required}

run_stage() {
  local name=$1; shift
  local remain=$(( DEADLINE - $(date +%s) ))
  if [ "$remain" -lt 900 ]; then
    echo "=== skip $name: ${remain}s left before deadline"
    return 1
  fi
  echo "=== stage $name start $(date) (${remain}s budget)"
  setsid "$@" &
  local pg=$!
  ( sleep "$remain"; echo "=== stage $name hit deadline, killing"; \
    kill -- -"$pg" 2>/dev/null ) &
  local watcher=$!
  wait "$pg"; local rc=$?
  kill "$watcher" 2>/dev/null
  wait "$watcher" 2>/dev/null
  echo "=== stage $name exit=$rc $(date)"
  return "$rc"
}

link_if() { # link_if <target> <linkname> — only when target exists
  [ -e "$2" ] && return 0
  [ -e "$1" ] && ln -s "$1" "$2"
}

run_stage model_table bash research/scripts/model_table.sh \
  "Dropbox Urchin Luxo Bounce" /root/work/mtable

# 8/4 A/B arm := the mtable Urchin FBT cell (same collect/arbiter/bvae/FBT
# flags at the repo-default 8/4 iterations; see model_table.sh)
MT=/root/work/mtable/Urchin
AB=/root/work/iters_ab/Urchin-8-4
mkdir -p "$AB" "$AB/eval"
link_if "$MT/data" "$AB/data"
link_if "$MT/arbiter" "$AB/arbiter"
link_if "$MT/bvae" "$AB/bvae"
link_if "$MT/FBT" "$AB/fbt"
link_if /root/work/mtable/eval/FBT/Urchin/logger.pkl "$AB/eval/logger.pkl"

run_stage iters_ab bash research/scripts/iters_ab.sh Urchin /root/work/iters_ab

# Urchin headline reuses the mtable dataset + BVAE; FBT is retrained at
# window=25 (the Luxo headline protocol) by headline_rl.sh itself
HW=/root/work/headline_urchin
mkdir -p "$HW"
link_if "$MT/data" "$HW/data"
link_if "$MT/bvae" "$HW/bvae"
run_stage headline_rl bash research/scripts/headline_rl.sh \
  Urchin "$HW" 12000000

echo "=== final table render"
python -m research.scripts.metrics_table --logdir=/root/work/mtable/eval \
  --models=RSSM,FIT,FBT,FRNLD --envs=Dropbox,Urchin,Luxo,Bounce \
  | tee /root/work/mtable/table.txt
echo "=== round3b done $(date)"
