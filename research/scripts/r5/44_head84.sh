#!/bin/bash
# Re-measure the Urchin 8/4 headline at HEAD (post dm-elision + inverse
# hoisting): the prefactor work runs once per substep, so at only 8 sweeps
# its amortization is weakest — verify the driver-visible headline did not
# regress from 13.7M before the round closes.
source "$(dirname "$0")/_lib.sh"
tpu_guard 600
OUT=logs/evidence/perf_ref_iters.log
if ! grep -q "^head84 " "$OUT" 2>/dev/null; then
  line=$(timeout --signal=TERM --kill-after=90 "$(cap_tpu 1800)" \
    env BENCH_MEGA_SMOKE=0 python bench.py 2>/dev/null | tail -1)
  echo "head84 $line" | tee -a "$OUT"
  commit_evidence "Evidence: Urchin 8/4 headline at HEAD (post solver-loop changes)"
fi
