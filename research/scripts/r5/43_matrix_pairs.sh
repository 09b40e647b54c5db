#!/bin/bash
# Pair-env megakernel evidence (VERDICT r4 weak #1/#3, next-round #2):
# (a) fill BENCH_MATRIX.json with mega rows for the contact-pair envs at
#     both iteration configs (Urchin rows measured live at HEAD in round 4
#     are kept by the incremental merge; env order puts the README's
#     4-env matrix first so a cap kill keeps the headline rows)
# (b) one tripwire-checked mega-path collect on a manipulation env (the
#     in-graph bitwise render tripwire dies loudly on any mega/XLA
#     disagreement).
source "$(dirname "$0")/_lib.sh"
tpu_guard 900
retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 6600)" \
  env BENCH_MATRIX=1 BENCH_MEGA_SMOKE=0 \
  BENCH_MATRIX_ENVS=LuxoCube,Object3,Bounce2,UrchinBalls python bench.py \
  2>&1 | tee logs/bench_matrix_pairs.log | tail -20
cp BENCH_MATRIX.json logs/evidence/BENCH_MATRIX.json
git add BENCH_MATRIX.json
commit_evidence "BENCH_MATRIX: mega rows for pair envs (LuxoCube/Object3/Bounce2/UrchinBalls)"

tpu_guard 600
if [ ! -f logs/evidence/collect_luxocube_mega.txt ]; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2400)" \
    python -m research.main --mode=collect --env=LuxoCube \
    --logdir=/root/work/collect_luxocube --train_barrels=2 --test_barrels=1 \
    --num_envs=4000 --barrel_format=native --vel_iters=8 --pos_iters=4 2>&1 \
    | tee /tmp/collect_luxocube.log | tail -5
  tail -20 /tmp/collect_luxocube.log > logs/evidence/collect_luxocube_mega.txt
  commit_evidence "Evidence: tripwire-checked mega-path collect on LuxoCube"
fi
