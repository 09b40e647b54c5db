#!/bin/bash
# Urchin real-PPO at the reference's 180/60 solver iterations to the 12M
# reference budget (reference: scripts/README.md:140 — 1e6 vector steps x 12
# envs; csv/plot.py:37 real success 0.998), then the N=1000 eval_policy
# protocol. VERDICT r4 missing #1 / next-round #1. Early-stop truncates the
# flat tail once the real test holds 1.0 for 4 consecutive test cycles.
source "$(dirname "$0")/_lib.sh"
WORK=/root/work/headline_urchin_ref
ITERS="--vel_iters=180 --pos_iters=60"
mkdir -p "$WORK"
tpu_guard 900

if [ ! -f "$WORK/ppo_real/done" ]; then
  CAP=$(cap_tpu 12600)
  CAP=$(( CAP - 2400 ))   # reserve the eval window
  tpu_guard 3000
  retry1 timeout --signal=TERM --kill-after=90 "$CAP" \
    python -m research.rl.main ppo --env=Urchin --goals=1 --autoreset=1 \
    --lenv=0 --num_envs=128 --total_steps=12000000 --steps_per_epoch=48000 \
    --bs=4096 --hidden_size=256 --logdir=$WORK/ppo_real --test_n=4 \
    --resume=1 --early_stop_succ=1.0 --early_stop_n=4 $ITERS
  rc=$?
  [ $rc -eq 0 ] && touch "$WORK/ppo_real/done"
fi

if [ -f "$WORK/ppo_real/ppo.pkl" ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2700)" \
    python -m research.scripts.eval_policy ppo --env=Urchin --goals=1 \
    --logdir=$WORK/ppo_real
fi
commit_evidence "Evidence: Urchin real-PPO @180/60 N=1000 eval"
