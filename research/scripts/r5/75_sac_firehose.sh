#!/bin/bash
# SAC firehose variant (reference: sac.py:200-240): on-policy, 256 batched
# on-device envs, one fused update per vector step — 5000 itrs = 1.28M
# transitions. Complements the host-loop wedge (39_sac_quick) per VERDICT
# r4 next-round #3 ("plus a short firehose variant"). Re-queued in round-5
# continuation: the original run was deadline-cut before its N=1000 eval
# (PROGRESS.md round-5 tail notes) and /root/work was wiped by a VM reset.
source "$(dirname "$0")/_lib.sh"
SW=/root/work/sac_luxo
mkdir -p "$SW"
tpu_guard 900
if [ ! -f "$SW/firehose/done" ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2400)" \
    python -m research.rl.main sac --env=Luxo --goals=1 --autoreset=1 \
    --num_envs=256 --total_steps=5000 --bs=256 --hidden_size=256 \
    --vel_iters=8 --pos_iters=4 --logdir=$SW/firehose --firehose=1
  rc=$?
  [ $rc -eq 0 ] && touch "$SW/firehose/done"
fi
if [ -f "$SW/firehose/sac.pkl" ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 1500)" \
    python -m research.scripts.eval_policy sac --env=Luxo --goals=1 \
    --logdir=$SW/firehose
fi
commit_evidence "Evidence: SAC firehose (1.28M on-device transitions), N=1000 eval"
