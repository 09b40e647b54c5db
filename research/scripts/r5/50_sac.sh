#!/bin/bash
# SAC demonstrated in anger (VERDICT r4 missing #2 / next-round #3): Luxo
# body-goal at the reference recipe (rl/sac.py defaults: 12 envs, bs=256;
# our --total_steps counts transitions), N=1000 eval_policy, plus the
# firehose on-policy variant (reference sac.py:189-222).
source "$(dirname "$0")/_lib.sh"
SW=/root/work/sac_luxo
mkdir -p "$SW"
tpu_guard 900

if [ ! -f "$SW/main/done" ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 5400)" \
    python -m research.rl.main sac --env=Luxo --goals=1 --autoreset=1 \
    --num_envs=12 --total_steps=1000000 --bs=256 --hidden_size=256 \
    --logdir=$SW/main --test_n=2
  rc=$?
  [ $rc -eq 0 ] && touch "$SW/main/done"
fi

if [ -f "$SW/main/sac.pkl" ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2700)" \
    python -m research.scripts.eval_policy sac --env=Luxo --goals=1 \
    --logdir=$SW/main
fi

if [ ! -f "$SW/firehose/done" ]; then
  tpu_guard 600
  # firehose counts VECTOR steps: 5000 itrs x 256 envs = 1.28M transitions
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2400)" \
    python -m research.rl.main sac --env=Luxo --goals=1 --autoreset=1 \
    --num_envs=256 --total_steps=5000 --bs=256 --hidden_size=256 \
    --logdir=$SW/firehose --firehose=1 && touch "$SW/firehose/done"
fi
commit_evidence "Evidence: SAC Luxo body-goal N=1000 eval + firehose run"
