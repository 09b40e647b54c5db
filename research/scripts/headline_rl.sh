#!/bin/bash
# Headline RL transfer protocol (reference README.md:111-139, BASELINE.md
# rows 1-4): PPO trained in the real sim vs PPO trained inside the learned
# sim (FBT), both evaluated on the real sim at N=1000 episodes.
# Usage: headline_rl.sh <ENV> <WORKDIR> [PPO_STEPS]
# Runs on the real TPU (no JAX_PLATFORMS override). One JAX process at a time.
set -euo pipefail
ENV=${1:-Luxo}
WORK=${2:-/tmp/headline_$ENV}
# Reference budget (research/scripts/README.md:138-147): --total_steps=500000
# counts VECTOR steps of 12 envs in the reference loop (ppo.py:127, logged as
# env_interactions = itr * num_envs) => 6M transitions. Our total_steps
# counts transitions directly.
PPO_STEPS=${3:-6000000}
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
mkdir -p "$WORK"

# the shared-tunnel TPU fails executions in episodic bad periods that last
# minutes (round-3 measurement: a key that failed 12 dispatches across 3
# process restarts over 30 min passed 9/9 once the episode ended); each
# phase is idempotent-or-resumable, so rerun it with long waits
retry() {
  local waits=(30 120 300 600 600 600)
  for i in 0 1 2 3 4 5; do
    "$@" && return 0
    echo "=== phase failed (attempt $((i+1))); retrying in ${waits[$i]}s" >&2
    sleep "${waits[$i]}"
  done
  return 1
}

echo "=== [1/7] collect $ENV"
if [ ! -d "$WORK/data/train" ] || \
   [ "$(ls "$WORK/data/train" | wc -l)" -lt 100 ]; then
  retry python -m research.main --mode=collect --env=$ENV --logdir=$WORK/data \
    --train_barrels=100 --test_barrels=10 --num_envs=4000 \
    --barrel_format=native
fi

echo "=== [2/7] BVAE"
if [ ! -f "$WORK/bvae/BVAE.pkl" ]; then
  # kicker preset hyperparams (reference: kicker.py:19-26)
  retry python -m research.main --mode=train --model=BVAE --env=$ENV \
    --datadir=$WORK/data --logdir=$WORK/bvae --total_itr=30000 --bs=32 \
    --window=5 --log_n=5000 --device_dataset=1 \
    --hidden_size=64 --vqK=64 --vqD=16 --nfilter=16
fi

echo "=== [3/7] FBT"
if [ ! -f "$WORK/fbt/FBT.pkl" ]; then
  retry python -m research.main --mode=train --model=FBT --env=$ENV \
    --datadir=$WORK/data --weightdir=$WORK/bvae --logdir=$WORK/fbt \
    --total_itr=100000 --bs=32 --window=25 --n_embed=512 --n_head=8 \
    --n_layer=4 --log_n=20000 --device_dataset=1
fi

echo "=== [4/7] PPO in the REAL sim"
# reference headline budgets (research/scripts/README.md:138-147): epoch =
# 48000 transitions, bs=4096 minibatches, 256-wide nets. The reference runs
# 12 env PROCESSES because its envs are CPU Box2D; here the vector env is
# vmapped on device, so the TPU-first batch is 128 worlds x 375 scan
# steps/epoch — same transitions, same epoch size, same update schedule.
# --resume=1 continues from ppo_last.pkl on retry.
if [ ! -f "$WORK/ppo_real/done" ]; then
  retry python -m research.rl.main ppo --env=$ENV --goals=1 --autoreset=1 \
    --lenv=0 --num_envs=128 --total_steps=$PPO_STEPS --steps_per_epoch=48000 \
    --bs=4096 --hidden_size=256 --logdir=$WORK/ppo_real --test_n=2 --resume=1
  touch "$WORK/ppo_real/done"
fi

echo "=== [5/7] eval PPO(real) on real sim, N=1000"
retry python -m research.scripts.eval_policy ppo --env=$ENV --goals=1 \
  --logdir=$WORK/ppo_real 2>&1 | tail -3

echo "=== [6/7] PPO in the LEARNED sim (FBT)"
if [ ! -f "$WORK/ppo_lenv/done" ]; then
  retry python -m research.rl.main ppo --env=$ENV --goals=1 --autoreset=1 \
    --lenv=1 --model=FBT --weightdir=$WORK/fbt --num_envs=128 \
    --total_steps=$PPO_STEPS --steps_per_epoch=48000 --bs=4096 \
    --hidden_size=256 --logdir=$WORK/ppo_lenv --test_n=2 --lenv_test=0 \
    --resume=1
  touch "$WORK/ppo_lenv/done"
fi

echo "=== [7/7] eval PPO(lenv) on real sim, N=1000"
retry python -m research.scripts.eval_policy ppo --env=$ENV --goals=1 \
  --logdir=$WORK/ppo_lenv 2>&1 | tail -3

echo "=== chain complete: $WORK"
