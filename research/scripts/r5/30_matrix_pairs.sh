#!/bin/bash
# Fill BENCH_MATRIX.json with mega rows for the contact-pair envs at both
# iteration configs (VERDICT r4 weak #3 / next-round #2). Urchin rows were
# measured live at HEAD in round 4 and are kept by the incremental merge.
source "$(dirname "$0")/_lib.sh"
tpu_guard 900
retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 7200)" \
  env BENCH_MATRIX=1 BENCH_MEGA_SMOKE=0 \
  BENCH_MATRIX_ENVS=LuxoCube,Object3,UrchinBalls,Bounce2 python bench.py \
  2>&1 | tee logs/bench_matrix_pairs.log | tail -20
cp BENCH_MATRIX.json logs/evidence/BENCH_MATRIX.json
git add BENCH_MATRIX.json
commit_evidence "BENCH_MATRIX: mega rows for pair envs (LuxoCube/Object3/UrchinBalls/Bounce2)"
