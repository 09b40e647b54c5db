#!/bin/bash
# Round-4 evidence continuation part B — run after headline_rl_ref.sh:
#   1. Bounce model-table column (collect already done by round4_continue)
#   2. RSSM/Dropbox FVD cell redo (pre-float64-fix value was negative)
#   3. final table render
#   4. SAC trained in anger: Luxo body-goal at the reference Luxo budget
#      (5e5 reference-loop steps; our total_steps counts transitions) +
#      a firehose-path run, then N=1000 eval
# Every stage is resume-aware; rerun after a kill is safe.
# Usage: round4b.sh [DEADLINE_EPOCH]
set -uo pipefail
DEADLINE=${1:-9999999999}
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

run_stage() {
  local name=$1; shift
  local remain=$(( DEADLINE - $(date +%s) ))
  if [ "$remain" -lt 600 ]; then
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

# The matched-physics headline variants are the cheapest unmet evidence
# items (VERDICT r3 weak #2) — run them before the multi-hour table/SAC
# stages so a deadline squeeze can't drop them.
echo "=== headline variants (matched-physics exit lever, taller SUB tiles)"
mkdir -p logs
if ! grep -q vs_baseline logs/bench_ref_exit.log 2>/dev/null; then
  run_stage bench_ref_exit env BENCH_ITERS=ref BENCH_EXIT_TOL=1e-4 \
    timeout 1800 python bench.py
fi 2>&1 | tee -a logs/bench_ref_exit.log
if ! grep -q vs_baseline logs/bench_sub16.log 2>/dev/null; then
  run_stage bench_sub16 env BOXLCD_MEGA_SUB=16 \
    timeout 1800 python bench.py
fi 2>&1 | tee -a logs/bench_sub16.log

run_stage table_bounce bash research/scripts/model_table.sh \
  "Bounce" /root/work/mtable

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

SW=/root/work/sac_luxo
mkdir -p "$SW"
echo "=== SAC Luxo body-goal (reference Luxo budget)"
if [ ! -f "$SW/main/done" ]; then
  run_stage sac_luxo python -m research.rl.main sac --env=Luxo --goals=1 \
    --autoreset=1 --num_envs=12 --total_steps=500000 --bs=256 \
    --hidden_size=256 --logdir=$SW/main --test_n=2 --resume=1 \
    && touch "$SW/main/done"
fi
echo "=== SAC eval N=1000"
run_stage sac_eval python -m research.scripts.eval_policy sac --env=Luxo \
  --goals=1 --logdir=$SW/main
echo "=== SAC firehose path (big batched env, no replay; short anger run)"
if [ ! -f "$SW/firehose/done" ]; then
  # firehose counts VECTOR steps: 5000 itrs x 256 envs = 1.28M transitions
  run_stage sac_firehose python -m research.rl.main sac --env=Luxo --goals=1 \
    --autoreset=1 --num_envs=256 --total_steps=5000 --bs=256 \
    --hidden_size=256 --logdir=$SW/firehose --firehose=1 \
    && touch "$SW/firehose/done"
fi

echo "=== round4b done $(date)"
