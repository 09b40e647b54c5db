#!/bin/bash
# Round-3 evidence chain, restaged (supersedes round3b.sh): at measured
# pace (~130 min/env) the 4-env table would eat the whole budget, so the
# A/B and the Urchin RL headline are sequenced BEFORE the last table env:
#   1. table envs Dropbox (done) + Urchin + Luxo
#   2. solver-iteration A/B (8/4 arm = symlinked mtable Urchin FBT cell)
#   3. Urchin RL headline (reuses mtable Urchin data + BVAE)
#   4. table env Bounce, then re-eval the one cell computed before the
#      float64-FID fix (RSSM/Dropbox printed a negative FVD)
# Every stage runs in its own process group and is killed at DEADLINE so
# the driver's bench.py gets the TPU back. One JAX process at a time.
# Usage: round3c.sh <DEADLINE_EPOCH>
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

run_stage table_main bash research/scripts/model_table.sh \
  "Dropbox Urchin Luxo" /root/work/mtable

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

run_stage table_bounce bash research/scripts/model_table.sh \
  "Bounce" /root/work/mtable

# RSSM/Dropbox was evaluated before the float64-FID fix; redo that one cell
if [ -f /root/work/mtable/eval/RSSM/Dropbox/logger.pkl ] && \
   python - <<'EOF'
import pickle
t = pickle.load(open('/root/work/mtable/eval/RSSM/Dropbox/logger.pkl', 'rb'))
raise SystemExit(0 if any(v[0] < 0 for k, v in t.items()
                          if k.endswith(':fvd')) else 1)
EOF
then
  rm /root/work/mtable/eval/RSSM/Dropbox/logger.pkl
  run_stage rssm_dropbox_redo bash research/scripts/model_table.sh \
    "Dropbox" /root/work/mtable
fi

echo "=== final table render"
python -m research.scripts.metrics_table --logdir=/root/work/mtable/eval \
  --models=RSSM,FIT,FBT,FRNLD --envs=Dropbox,Urchin,Luxo,Bounce \
  | tee /root/work/mtable/table.txt
echo "=== round3c done $(date)"
