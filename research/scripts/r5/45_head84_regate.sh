#!/bin/bash
# Confirm the 8/4 headline recovers after gating the prefactor path to
# high-iteration configs (13.7M -> 8.3M regression found by 44_head84).
source "$(dirname "$0")/_lib.sh"
tpu_guard 600
OUT=logs/evidence/perf_ref_iters.log
if ! grep -q "^head84_regate " "$OUT" 2>/dev/null; then
  line=$(timeout --signal=TERM --kill-after=90 "$(cap_tpu 1800)" \
    env BENCH_MEGA_SMOKE=0 python bench.py 2>/dev/null | tail -1)
  echo "head84_regate $line" | tee -a "$OUT"
  commit_evidence "Evidence: Urchin 8/4 headline after gating the prefactor to high-iteration kernels"
fi
