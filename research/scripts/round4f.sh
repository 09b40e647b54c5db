#!/bin/bash
# Round-4 tail orchestrator: runs AFTER round4e.sh exits (waits on its pid —
# one JAX process at a time, CLAUDE.md), then spends the remaining session
# budget on the highest-value still-open items, priority ordered so a
# deadline squeeze cuts from the tail:
#   1. full pytest at HEAD (validates the skip_inert megakernel commit)
#   2. resume Urchin real-PPO @180/60 toward the 12M reference budget and
#      re-eval FRESH at N=1000 (BASELINE row 3; the 6.05M checkpoint = 0.798)
#   3. SAC eval/firehose leftovers round4e's deadline cut (VERDICT missing #5)
#   4. BENCH_MATRIX regen at HEAD incl. exit-tol rows (VERDICT weak #1)
#   5. roofline/MFU measurement (VERDICT weak #6)
#   6. exit_probe on CPU — matched-physics decision data (VERDICT weak #2)
#   7. SUB=16 bench variants if time remains
# Usage: round4f.sh <DEADLINE_EPOCH> [ROUND4E_PID]
set -uo pipefail
DEADLINE=${1:?deadline epoch}
E_PID=${2:-$(cat /tmp/round4e.pid 2>/dev/null || echo 0)}
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
WORK=/root/work/headline_urchin_ref
SW=/root/work/sac_luxo
ITERS="--vel_iters=180 --pos_iters=60"
mkdir -p logs "$WORK" "$SW"

# wait for round4e (never kill it; its own deadline already passed, the tail
# skip-sleeps finish within ~20 min)
while [ "$E_PID" -gt 0 ] && kill -0 "$E_PID" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== deadline hit while round4e still running; giving up"
    exit 0
  fi
  sleep 60
done
echo "=== round4e done; round4f starting $(date)"

run_stage() {  # run_stage <name> <cap_s> <cmd...>; rc 99 = deadline skip
  local name=$1 cap=$2; shift 2
  local remain=$(( DEADLINE - $(date +%s) ))
  if [ "$remain" -lt 420 ]; then
    echo "=== skip $name: ${remain}s left before deadline"
    return 99
  fi
  [ "$cap" -gt "$remain" ] && cap=$remain
  echo "=== stage $name start $(date) (cap ${cap}s)"
  timeout --signal=TERM --kill-after=90 "$cap" "$@"
  local rc=$?
  echo "=== stage $name exit=$rc $(date)"
  return $rc
}

# retry once on real failures (transient poisoned-tunnel sessions), but NOT
# on a deadline/cap kill (124/137) or a deadline skip (99)
retry1() {
  "$@"
  local rc=$?
  if [ $rc -ne 0 ] && [ $rc -ne 124 ] && [ $rc -ne 137 ] && [ $rc -ne 99 ]
  then
    echo "=== stage failed rc=$rc; retrying once in 120s" >&2
    sleep 120
    "$@"; rc=$?
  fi
  return $rc
}

# --- 1. full test suite at HEAD (CPU; conftest forces cpu + 8 devices) ---
if [ ! -s logs/pytest_r4.log ] || ! grep -q " passed" logs/pytest_r4.log; then
  run_stage pytest 3600 python -m pytest tests/ -q 2>&1 \
    | tee logs/pytest_r4.log | tail -8
fi

# --- 2. Urchin real-PPO @180/60: resume toward 12M, then FRESH eval ------
if [ ! -f "$WORK/ppo_real/done" ] && [ -f "$WORK/ppo_real/ppo_last.pkl" ]
then
  # dynamic cap: everything left minus reserves for eval(1500) + sac(2100)
  # + matrix(3600) + roofline(1000) + buffer(900)
  RESUME_CAP=$(( DEADLINE - $(date +%s) - 9100 ))
  if [ "$RESUME_CAP" -gt 1200 ]; then
    retry1 run_stage ppo_resume "$RESUME_CAP" python -m research.rl.main ppo \
      --env=Urchin --goals=1 --autoreset=1 --lenv=0 --num_envs=128 \
      --total_steps=12000000 --steps_per_epoch=48000 --bs=4096 \
      --hidden_size=256 --logdir=$WORK/ppo_real --test_n=2 --resume=1 \
      $ITERS && touch "$WORK/ppo_real/done"
    if [ -s logs/eval_real_urchin_ref.txt ] && \
       [ ! -f logs/eval_real_urchin_ref_6M.txt ]; then
      mv logs/eval_real_urchin_ref.txt logs/eval_real_urchin_ref_6M.txt
    fi
    retry1 run_stage eval_real2 1500 bash -c "python -m \
      research.scripts.eval_policy ppo --env=Urchin --goals=1 \
      --logdir=$WORK/ppo_real 2>&1 | tail -3 \
      | tee logs/eval_real_urchin_ref.txt"
  fi
fi

# --- 3. SAC leftovers (round4e deadline usually cuts these) ---------------
if [ -f "$SW/main/sac.pkl" ] && [ ! -s "logs/eval_sac_luxo.txt" ]; then
  retry1 run_stage sac_eval 1500 bash -c "python -m \
    research.scripts.eval_policy sac --env=Luxo --goals=1 --logdir=$SW/main \
    2>&1 | tail -3 | tee logs/eval_sac_luxo.txt"
fi
if [ -f "$SW/main/done" ] && [ ! -f "$SW/firehose/done" ]; then
  retry1 run_stage sac_firehose 1800 python -m research.rl.main sac \
    --env=Luxo --goals=1 --autoreset=1 --num_envs=256 --total_steps=5000 \
    --bs=256 --hidden_size=256 --logdir=$SW/firehose --firehose=1 \
    && touch "$SW/firehose/done"
fi

# --- 4. BENCH_MATRIX regen at HEAD (exit-tol rows label the new variants) --
if ! python - <<'EOF'
import json
rows = json.load(open('BENCH_MATRIX.json'))
raise SystemExit(0 if any('exit_tol' in r for r in rows) else 1)
EOF
then
  retry1 run_stage bench_matrix 4500 env BENCH_MATRIX=1 python bench.py \
    2>&1 | tee logs/bench_matrix.log | tail -6
fi

# --- 5. roofline / MFU of the megakernel rollout (VERDICT weak #6) --------
# CPU jaxpr counting fed with the HEAD-measured rates from BENCH_MATRIX
if [ ! -s logs/roofline.log ] || ! grep -q "bound" logs/roofline.log; then
  run_stage roofline 1800 env PYTHONPATH= JAX_PLATFORMS=cpu bash -c '
    SPS_84=$(python -c "import json; rows=json.load(open(\"BENCH_MATRIX.json\"));
print(max([r.get(\"steps_per_sec\",0) for r in rows if r[\"env\"]==\"Urchin\" and r[\"vel_iters\"]==8 and r[\"solver\"]==\"mega\"], default=12902594))" 2>/dev/null || echo 12902594)
    SPS_REF=$(python -c "import json; rows=json.load(open(\"BENCH_MATRIX.json\"));
print(max([r.get(\"steps_per_sec\",0) for r in rows if r[\"env\"]==\"Urchin\" and r[\"vel_iters\"]==180 and r.get(\"exit_tol\",0)==0 and r[\"solver\"]==\"mega\"], default=1680000))" 2>/dev/null || echo 1680000)
    python -m research.scripts.roofline --env=Urchin --iters=8,4 \
      --steps_per_sec=$SPS_84 --worlds=4096
    python -m research.scripts.roofline --env=Urchin --iters=180,60 \
      --steps_per_sec=$SPS_REF --worlds=4096
  ' 2>&1 | tee logs/roofline.log | tail -16
fi

# --- 6. exit_probe on CPU: per-world vs tile-max sweeps-to-tol at 180/60 --
if [ ! -s logs/exit_probe_urchin.log ]; then
  run_stage exit_probe 2400 env PYTHONPATH= JAX_PLATFORMS=cpu \
    python -m research.scripts.exit_probe Urchin 128 20 2>&1 \
    | tee logs/exit_probe_urchin.log | tail -20
fi

# --- 7. SUB=16 bench variants (matched-physics levers) ---------------------
if ! grep -q vs_baseline logs/bench_sub16.log 2>/dev/null; then
  retry1 run_stage bench_sub16 1500 env BOXLCD_MEGA_SUB=16 python bench.py \
    2>&1 | tee -a logs/bench_sub16.log
fi
if ! grep -q vs_baseline logs/bench_ref_exit_sub16.log 2>/dev/null; then
  retry1 run_stage bench_ref_exit_sub16 1500 env BENCH_ITERS=ref \
    BENCH_EXIT_TOL=1e-4 BOXLCD_MEGA_SUB=16 python bench.py 2>&1 \
    | tee -a logs/bench_ref_exit_sub16.log
fi

echo "=== round4f done $(date)"
