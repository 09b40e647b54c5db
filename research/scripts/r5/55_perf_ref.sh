#!/bin/bash
# Matched-physics (180/60) throughput experiments (VERDICT r4 next-round
# #5: 1.81M -> target 2.5M env-steps/s): (a) the trace-time dm elision in
# the fixed-trip-count velocity loop, (b) BOXLCD_MEGA_SUB tile-height
# sweep. Every row appends to logs/evidence/perf_ref_iters.log.
source "$(dirname "$0")/_lib.sh"
tpu_guard 900
OUT=logs/evidence/perf_ref_iters.log
run_one() {  # run_one <label> [env overrides...]
  local label=$1; shift
  grep -q "^$label " "$OUT" 2>/dev/null && return 0
  tpu_guard 600 || return 99
  local line
  line=$(timeout --signal=TERM --kill-after=90 "$(cap_tpu 2400)" \
    env BENCH_ITERS=ref BENCH_MEGA_SMOKE=0 "$@" python bench.py 2>/dev/null \
    | tail -1)
  echo "$label $line" | tee -a "$OUT"
}
echo "=== matched-physics perf sweep $(date) (post dm-elision HEAD)" >> "$OUT"
run_one head_sub8
run_one sub16 BOXLCD_MEGA_SUB=16
run_one sub32 BOXLCD_MEGA_SUB=32
run_one sub4 BOXLCD_MEGA_SUB=4
commit_evidence "Evidence: matched-physics perf sweep (dm elision + SUB tile heights)"
