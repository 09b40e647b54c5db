#!/bin/bash
# Single matched-physics measurement at HEAD (dm elision + effective-mass
# inverse hoisting): the VERDICT r4 #5 target is >= 2.5M env-steps/s at
# the reference's 180/60 iterations (pre-optimization baseline 1.81M).
# The SUB tile-height sweep stays in 55_perf_ref.sh for surplus time.
source "$(dirname "$0")/_lib.sh"
tpu_guard 900
OUT=logs/evidence/perf_ref_iters.log
if ! grep -q "^head_sub8 " "$OUT" 2>/dev/null; then
  echo "=== post-hoist matched-physics headline $(date)" >> "$OUT"
  line=$(timeout --signal=TERM --kill-after=90 "$(cap_tpu 2400)" \
    env BENCH_ITERS=ref BENCH_MEGA_SMOKE=0 python bench.py 2>/dev/null \
    | tail -1)
  echo "head_sub8 $line" | tee -a "$OUT"
  commit_evidence "Evidence: matched-physics throughput at HEAD (dm elision + inverse hoisting)"
fi
