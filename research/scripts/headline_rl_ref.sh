#!/bin/bash
# Headline RL protocol at the REFERENCE's own solver iterations (180/60 —
# boxLCD/world_env.py:446-452), testing the round-4 hypothesis that the
# Urchin convergence gap at the 8/4 default (real 0.843 / dream 0.227 vs
# reference 0.998 / 0.955) is contact-stiffness-driven: Urchin's rolling
# gait is contact-dominated, and 8/4 contacts are measurably softer
# (PARITY.md). All sim-touching phases get --vel_iters=180 --pos_iters=60;
# eval_policy inherits the iters from the checkpoint's saved G.
# Phase order differs from headline_rl.sh: real-PPO runs FIRST (no data
# dependency) so its early curve can be compared against the reference's
# (csv/plot.py data: success 0.375 @ 0.62M transitions, 1.0 @ 6M).
# Usage: headline_rl_ref.sh <ENV> <WORKDIR> [PPO_STEPS]
set -uo pipefail
ENV=${1:-Urchin}
WORK=${2:-/root/work/headline_${ENV}_ref}
PPO_STEPS=${3:-12000000}
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
mkdir -p "$WORK"
ITERS="--vel_iters=180 --pos_iters=60"

retry() {
  local waits=(30 120 300 600 600 600)
  for i in 0 1 2 3 4 5; do
    "$@" && return 0
    echo "=== phase failed (attempt $((i+1))); retrying in ${waits[$i]}s" >&2
    sleep "${waits[$i]}"
  done
  return 1
}

echo "=== [1/7] PPO in the REAL sim @180/60"
if [ ! -f "$WORK/ppo_real/done" ]; then
  retry python -m research.rl.main ppo --env=$ENV --goals=1 --autoreset=1 \
    --lenv=0 --num_envs=128 --total_steps=$PPO_STEPS --steps_per_epoch=48000 \
    --bs=4096 --hidden_size=256 --logdir=$WORK/ppo_real --test_n=2 \
    --resume=1 $ITERS
  touch "$WORK/ppo_real/done"
fi

echo "=== [2/7] eval PPO(real) on real sim @180/60, N=1000"
retry python -m research.scripts.eval_policy ppo --env=$ENV --goals=1 \
  --logdir=$WORK/ppo_real 2>&1 | tail -3

echo "=== [3/7] collect $ENV @180/60"
if [ ! -d "$WORK/data/train" ] || \
   [ "$(ls "$WORK/data/train" | wc -l)" -lt 100 ]; then
  retry python -m research.main --mode=collect --env=$ENV --logdir=$WORK/data \
    --train_barrels=100 --test_barrels=10 --num_envs=4000 \
    --barrel_format=native $ITERS
fi

echo "=== [4/7] BVAE"
if [ ! -f "$WORK/bvae/BVAE.pkl" ]; then
  retry python -m research.main --mode=train --model=BVAE --env=$ENV \
    --datadir=$WORK/data --logdir=$WORK/bvae --total_itr=30000 --bs=32 \
    --window=5 --log_n=5000 --device_dataset=1 \
    --hidden_size=64 --vqK=64 --vqD=16 --nfilter=16 $ITERS
fi

echo "=== [5/7] FBT"
if [ ! -f "$WORK/fbt/FBT.pkl" ]; then
  retry python -m research.main --mode=train --model=FBT --env=$ENV \
    --datadir=$WORK/data --weightdir=$WORK/bvae --logdir=$WORK/fbt \
    --total_itr=100000 --bs=32 --window=25 --n_embed=512 --n_head=8 \
    --n_layer=4 --log_n=20000 --device_dataset=1 $ITERS
fi

echo "=== [6/7] PPO in the LEARNED sim (FBT), real-env tests @180/60"
if [ ! -f "$WORK/ppo_lenv/done" ]; then
  retry python -m research.rl.main ppo --env=$ENV --goals=1 --autoreset=1 \
    --lenv=1 --model=FBT --weightdir=$WORK/fbt --num_envs=128 \
    --total_steps=$PPO_STEPS --steps_per_epoch=48000 --bs=4096 \
    --hidden_size=256 --logdir=$WORK/ppo_lenv --test_n=2 --lenv_test=0 \
    --resume=1 $ITERS
  touch "$WORK/ppo_lenv/done"
fi

echo "=== [7/7] eval PPO(lenv) on real sim @180/60, N=1000"
retry python -m research.scripts.eval_policy ppo --env=$ENV --goals=1 \
  --logdir=$WORK/ppo_lenv 2>&1 | tail -3

echo "=== ref-iters chain complete: $WORK"
