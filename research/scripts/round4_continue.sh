#!/bin/bash
# Round-4 evidence continuation: finishes what round 3's chain (round3c.sh)
# could not fit before its TPU deadline. Launch FIRST thing in round 4 —
# every stage is resume-aware, so re-running after a kill is safe.
#   1. Urchin real-PPO: resume to the full 12M-transition reference budget
#      (round 3 stopped at ~8.5M to fit the N=1000 eval) + re-eval N=1000
#   2. Urchin dream-PPO (FBT lenv) at the same budget + eval N=1000
#      -> completes BASELINE rows 3-4 (reference: 0.998 / 0.955)
#   3. model-quality table env Bounce (VERDICT r2 #6, last missing env)
#   4. RSSM/Dropbox FVD cell re-eval (computed pre-float64-FID fix)
#   5. final table render
# Requires /root/work/{headline_urchin,mtable} from round 3 (kept on disk).
# Usage: round4_continue.sh <DEADLINE_EPOCH>
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

HW=/root/work/headline_urchin
# round 3 touched ppo_real/done to run the eval early; remove it so the
# resume-aware phase 4 trains the remaining budget, then re-evals
if [ -f "$HW/ppo_real/done" ] && [ ! -f "$HW/ppo_real/full_budget" ]; then
  rm "$HW/ppo_real/done"
fi
run_stage headline_rl bash research/scripts/headline_rl.sh \
  Urchin "$HW" 12000000 && touch "$HW/ppo_real/full_budget"

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
echo "=== round4_continue done $(date)"
