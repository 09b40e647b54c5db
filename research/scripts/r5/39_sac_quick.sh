#!/bin/bash
# SAC wedge (VERDICT r4 missing #2): Luxo body-goal with the reference
# recipe shape (12 envs, bs 256, hidden 256 — rl/sac.py defaults) at a
# REDUCED budget (350k transitions vs the reference's ~12M) so a number
# exists even if the round's tail is cut; the full-budget stage (50_sac)
# extends it if the window allows. Honest labeling: the evidence JSON
# records total_steps; any README row cites the budget.
source "$(dirname "$0")/_lib.sh"
SW=/root/work/sac_luxo
mkdir -p "$SW"
tpu_guard 900

if [ ! -f "$SW/main/quick_done" ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2400)" \
    python -m research.rl.main sac --env=Luxo --goals=1 --autoreset=1 \
    --num_envs=12 --total_steps=350000 --bs=256 --hidden_size=256 \
    --logdir=$SW/main --test_n=2
  rc=$?
  [ $rc -eq 0 ] && touch "$SW/main/quick_done"
fi

if [ -f "$SW/main/sac.pkl" ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 1800)" \
    python -m research.scripts.eval_policy sac --env=Luxo --goals=1 \
    --logdir=$SW/main
fi
commit_evidence "Evidence: SAC Luxo body-goal (reduced 350k budget), N=1000 eval"
