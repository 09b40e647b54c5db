#!/bin/bash
# On-chip Mosaic lowering check for the PAIR-env megakernels after the
# round-5 solver changes (dm elision + inverse hoisting): Urchin compiled
# on-chip in 39x, but mf_pp/mf_pair code paths changed too and interpret
# mode cannot catch lowering-only regressions. Tiny headline keeps it fast.
source "$(dirname "$0")/_lib.sh"
tpu_guard 600
if ! grep -q "mega_smoke.*LuxoCube:ok" logs/evidence/pair_smoke_r5.log 2>/dev/null
then
  timeout --signal=TERM --kill-after=90 "$(cap_tpu 1500)" \
    env BENCH_WORLDS=1024 BENCH_STEPS=4 BENCH_ENV=Urchin python bench.py \
    2>&1 | grep -E "mega_smoke|mega compile smoke" \
    | tee logs/evidence/pair_smoke_r5.log
  commit_evidence "Evidence: pair-env megakernel on-chip smoke after round-5 solver changes"
fi
