#!/bin/bash
# On-chip proof of the pair-env megakernel (VERDICT r4 weak #1): the _bsel
# Mosaic i1 fix (fb863d2) landed with no TPU run after it. bench.py's
# mega_smoke stage compiles Urchin/LuxoCube/Object3 fused kernels on the
# real chip first, then the headline measures LuxoCube on the mega path.
source "$(dirname "$0")/_lib.sh"
tpu_guard
if ! grep -q vs_baseline logs/bench_luxocube_mega.log 2>/dev/null; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2700)" \
    env BENCH_ENV=LuxoCube BENCH_SOLVER=mega python bench.py 2>&1 \
    | tee -a logs/bench_luxocube_mega.log
fi
cp logs/bench_luxocube_mega.log logs/evidence/bench_luxocube_mega.log
commit_evidence "Evidence: LuxoCube megakernel on-chip compile + bench (post-_bsel fix)"
