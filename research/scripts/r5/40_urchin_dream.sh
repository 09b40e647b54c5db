#!/bin/bash
# Urchin dream arm at 180/60 (VERDICT r4 next-round #1, second half):
# collect -> BVAE -> FBT -> PPO inside the learned sim (real-env tests) ->
# N=1000 real-sim eval. Reference: README.md:131 dream transfer 0.955,
# budgets scripts/README.md:147 (1e6 vector steps x 12 envs = 12M).
source "$(dirname "$0")/_lib.sh"
WORK=/root/work/headline_urchin_ref
ITERS="--vel_iters=180 --pos_iters=60"
mkdir -p "$WORK"
tpu_guard 900

echo "=== collect"
if [ ! -d "$WORK/data/train" ] || \
   [ "$(ls "$WORK/data/train" | wc -l)" -lt 100 ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 3600)" \
    python -m research.main --mode=collect --env=Urchin --logdir=$WORK/data \
    --train_barrels=100 --test_barrels=10 --num_envs=4000 \
    --barrel_format=native $ITERS || exit 1
fi

echo "=== BVAE"
tpu_guard 900
if [ ! -f "$WORK/bvae/BVAE.pkl" ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 3600)" \
    python -m research.main --mode=train --model=BVAE --env=Urchin \
    --datadir=$WORK/data --logdir=$WORK/bvae --total_itr=30000 --bs=32 \
    --window=5 --log_n=15000 --device_dataset=1 \
    --hidden_size=64 --vqK=64 --vqD=16 --nfilter=16 $ITERS || exit 1
fi

echo "=== FBT"
tpu_guard 900
if [ ! -f "$WORK/fbt/FBT.pkl" ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 5400)" \
    python -m research.main --mode=train --model=FBT --env=Urchin \
    --datadir=$WORK/data --weightdir=$WORK/bvae --logdir=$WORK/fbt \
    --total_itr=100000 --bs=32 --window=25 --n_embed=512 --n_head=8 \
    --n_layer=4 --log_n=50000 --device_dataset=1 $ITERS || exit 1
fi

echo "=== PPO in the learned sim (real-env tests @180/60)"
tpu_guard 1800
if [ ! -f "$WORK/ppo_lenv/done" ]; then
  CAP=$(cap_tpu 10800)
  CAP=$(( CAP - 2400 ))   # reserve the eval window
  retry1 timeout --signal=TERM --kill-after=90 "$CAP" \
    python -m research.rl.main ppo --env=Urchin --goals=1 --autoreset=1 \
    --lenv=1 --model=FBT --weightdir=$WORK/fbt --num_envs=128 \
    --total_steps=12000000 --steps_per_epoch=48000 --bs=4096 \
    --hidden_size=256 --logdir=$WORK/ppo_lenv --test_n=4 --lenv_test=0 \
    --resume=1 --early_stop_succ=0.97 --early_stop_n=5 $ITERS
  rc=$?
  [ $rc -eq 0 ] && touch "$WORK/ppo_lenv/done"
fi

echo "=== eval dream policy on real sim, N=1000"
if [ -f "$WORK/ppo_lenv/ppo.pkl" ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2700)" \
    python -m research.scripts.eval_policy ppo --env=Urchin --goals=1 \
    --logdir=$WORK/ppo_lenv
fi
commit_evidence "Evidence: Urchin dream-PPO @180/60 transfer, N=1000 eval"
