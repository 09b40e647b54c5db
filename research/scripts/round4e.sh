#!/bin/bash
# Round-4 recovery master chain. The VM reset wiped /root/work + logs/, so
# every still-open VERDICT r3 evidence item reruns here from scratch as ONE
# serial TPU chain (CLAUDE.md: 1 core, never two JAX processes), priority
# ordered so a deadline squeeze cuts from the tail:
#   0. matched-physics exact-raster headline w/ convergence exit (weak #2)
#   1. Urchin real-PPO @180/60 to 12M + N=1000 eval   (BASELINE row 3)
#   2. collect/BVAE/FBT @180/60, dream-PPO to 6M + N=1000 (BASELINE row 4)
#   3. SAC Luxo body-goal at the reference budget + firehose + eval
#   4. remaining bench variants + BENCH_MATRIX regen at HEAD (weak #1)
#   5. full pytest (CPU) at HEAD
#   6. model table: Dropbox redo (negative-FVD cell) + Bounce column
# Every stage is resume-aware where the underlying tool supports it, hard
# time-capped (a deadline kill of PPO still leaves ppo.pkl = best-so-far
# checkpoint for the N=1000 eval), and never killed by pattern.
# Usage: round4e.sh <DEADLINE_EPOCH>
set -uo pipefail
DEADLINE=${1:?deadline epoch}
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
WORK=/root/work/headline_urchin_ref
SW=/root/work/sac_luxo
ITERS="--vel_iters=180 --pos_iters=60"
mkdir -p logs "$WORK" "$SW"

run_stage() {  # run_stage <name> <cap_s> <cmd...>
  local name=$1 cap=$2; shift 2
  local remain=$(( DEADLINE - $(date +%s) ))
  if [ "$remain" -lt 420 ]; then
    echo "=== skip $name: ${remain}s left before deadline"
    return 1
  fi
  [ "$cap" -gt "$remain" ] && cap=$remain
  echo "=== stage $name start $(date) (cap ${cap}s)"
  timeout --signal=TERM --kill-after=90 "$cap" "$@"
  local rc=$?
  echo "=== stage $name exit=$rc $(date)"
  return $rc
}

# retry once on real failures (transient poisoned-tunnel sessions), but
# NOT on a deadline/cap kill (rc 124/137) — those move on by design
retry1() {
  "$@"
  local rc=$?
  if [ $rc -ne 0 ] && [ $rc -ne 124 ] && [ $rc -ne 137 ]; then
    echo "=== stage failed rc=$rc; retrying once in 120s" >&2
    sleep 120
    "$@"; rc=$?
  fi
  return $rc
}

# --- 0. matched-physics headline w/ solver convergence exit (cheap) ---
if ! grep -q vs_baseline logs/bench_ref_exit.log 2>/dev/null; then
  retry1 run_stage bench_ref_exit 1500 env BENCH_ITERS=ref \
    BENCH_EXIT_TOL=1e-4 python bench.py 2>&1 | tee -a logs/bench_ref_exit.log
fi

# --- 1. Urchin real-PPO @180/60 (BASELINE row 3; ref 0.998) ---
if [ ! -f "$WORK/ppo_real/done" ]; then
  retry1 run_stage ppo_real 10800 python -m research.rl.main ppo \
    --env=Urchin --goals=1 --autoreset=1 --lenv=0 --num_envs=128 \
    --total_steps=12000000 --steps_per_epoch=48000 --bs=4096 \
    --hidden_size=256 --logdir=$WORK/ppo_real --test_n=2 --resume=1 $ITERS \
    && touch "$WORK/ppo_real/done"
fi
if [ -f "$WORK/ppo_real/ppo.pkl" ] && [ ! -s "logs/eval_real_urchin_ref.txt" ]; then
  retry1 run_stage eval_real 2400 bash -c "python -m research.scripts.eval_policy \
    ppo --env=Urchin --goals=1 --logdir=$WORK/ppo_real 2>&1 | tail -3 \
    | tee logs/eval_real_urchin_ref.txt"
fi

# --- 2. dream arm @180/60 (BASELINE row 4; ref 0.955) ---
if [ ! -d "$WORK/data/train" ] || \
   [ "$(ls "$WORK/data/train" 2>/dev/null | wc -l)" -lt 100 ]; then
  retry1 run_stage collect 2700 python -m research.main --mode=collect \
    --env=Urchin --logdir=$WORK/data --train_barrels=100 --test_barrels=10 \
    --num_envs=4000 --barrel_format=native $ITERS
fi
[ -f $WORK/bvae/BVAE.pkl ] || retry1 run_stage bvae 2700 python -m \
  research.main --mode=train --model=BVAE --env=Urchin --datadir=$WORK/data \
  --logdir=$WORK/bvae --total_itr=30000 --bs=32 --window=5 --log_n=5000 \
  --device_dataset=1 --hidden_size=64 --vqK=64 --vqD=16 --nfilter=16 $ITERS
[ -f $WORK/fbt/FBT.pkl ] || retry1 run_stage fbt 5400 python -m \
  research.main --mode=train --model=FBT --env=Urchin --datadir=$WORK/data \
  --weightdir=$WORK/bvae --logdir=$WORK/fbt --total_itr=100000 --bs=32 \
  --window=25 --n_embed=512 --n_head=8 --n_layer=4 --log_n=20000 \
  --device_dataset=1 $ITERS
if [ -f "$WORK/fbt/FBT.pkl" ] && [ ! -f "$WORK/ppo_lenv/done" ]; then
  retry1 run_stage ppo_lenv 6000 python -m research.rl.main ppo \
    --env=Urchin --goals=1 --autoreset=1 --lenv=1 --model=FBT \
    --weightdir=$WORK/fbt --num_envs=128 --total_steps=6000000 \
    --steps_per_epoch=48000 --bs=4096 --hidden_size=256 \
    --logdir=$WORK/ppo_lenv --test_n=2 --lenv_test=0 --resume=1 $ITERS \
    && touch "$WORK/ppo_lenv/done"
fi
if [ -f "$WORK/ppo_lenv/ppo.pkl" ] && [ ! -s "logs/eval_lenv_urchin_ref.txt" ]; then
  retry1 run_stage eval_lenv 2400 bash -c "python -m research.scripts.eval_policy \
    ppo --env=Urchin --goals=1 --logdir=$WORK/ppo_lenv 2>&1 | tail -3 \
    | tee logs/eval_lenv_urchin_ref.txt"
fi

# --- 3. SAC in anger (VERDICT r3 missing #5; reference Luxo budget,
#        research/scripts/README.md:138-153; default 8/4 iters — Luxo RL
#        matched the reference at 8/4) ---
if [ ! -f "$SW/main/done" ]; then
  retry1 run_stage sac_luxo 4200 python -m research.rl.main sac --env=Luxo \
    --goals=1 --autoreset=1 --num_envs=12 --total_steps=500000 --bs=256 \
    --hidden_size=256 --logdir=$SW/main --test_n=2 \
    && touch "$SW/main/done"
fi
if [ -f "$SW/main/sac.pkl" ] && [ ! -s "logs/eval_sac_luxo.txt" ]; then
  retry1 run_stage sac_eval 1500 bash -c "python -m research.scripts.eval_policy \
    sac --env=Luxo --goals=1 --logdir=$SW/main 2>&1 | tail -3 \
    | tee logs/eval_sac_luxo.txt"
fi
if [ ! -f "$SW/firehose/done" ]; then
  # firehose counts VECTOR steps: 5000 itrs x 256 envs = 1.28M transitions
  retry1 run_stage sac_firehose 1800 python -m research.rl.main sac \
    --env=Luxo --goals=1 --autoreset=1 --num_envs=256 --total_steps=5000 \
    --bs=256 --hidden_size=256 --logdir=$SW/firehose --firehose=1 \
    && touch "$SW/firehose/done"
fi

# --- 4. remaining bench variants + BENCH_MATRIX regen (weak #1/#2) ---
if ! grep -q vs_baseline logs/bench_sub16.log 2>/dev/null; then
  retry1 run_stage bench_sub16 1500 env BOXLCD_MEGA_SUB=16 python bench.py \
    2>&1 | tee -a logs/bench_sub16.log
fi
if ! grep -q vs_baseline logs/bench_ref_exit_sub16.log 2>/dev/null; then
  retry1 run_stage bench_ref_exit_sub16 1500 env BENCH_ITERS=ref \
    BENCH_EXIT_TOL=1e-4 BOXLCD_MEGA_SUB=16 python bench.py 2>&1 \
    | tee -a logs/bench_ref_exit_sub16.log
fi
if ! python - <<'EOF'
import json
rows = json.load(open('BENCH_MATRIX.json'))
raise SystemExit(0 if any('exit_tol' in r for r in rows) else 1)
EOF
then
  retry1 run_stage bench_matrix 4500 env BENCH_MATRIX=1 python bench.py \
    2>&1 | tee logs/bench_matrix.log | tail -5
fi

# --- 5. full test suite at HEAD (CPU; conftest forces cpu + 8 devices) ---
if [ ! -s logs/pytest_r4.log ] || ! grep -q "passed" logs/pytest_r4.log; then
  run_stage pytest 3600 python -m pytest tests/ -q 2>&1 \
    | tee logs/pytest_r4.log | tail -8
fi

# --- 6. model table: Dropbox redo (neg-FVD cell) + Bounce (missing #2) ---
run_stage table_dropbox 7200 bash research/scripts/model_table.sh \
  "Dropbox" /root/work/mtable
run_stage table_bounce 7200 bash research/scripts/model_table.sh \
  "Bounce" /root/work/mtable
if [ -d /root/work/mtable/eval ]; then
  echo "=== final table render"
  python -m research.scripts.metrics_table --logdir=/root/work/mtable/eval \
    --models=RSSM,FIT,FBT,FRNLD --envs=Dropbox,Bounce 2>&1 \
    | tee logs/mtable_r4.txt
fi

echo "=== round4e done $(date)"
