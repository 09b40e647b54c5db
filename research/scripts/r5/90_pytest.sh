#!/bin/bash
# CPU tail: full test suite at HEAD (allowed past the TPU deadline).
source "$(dirname "$0")/_lib.sh"
left=$(( R5_HARD_END - $(date +%s) ))
[ "$left" -lt 600 ] && { echo "no time for pytest"; exit 99; }
timeout --signal=TERM --kill-after=90 "$left" \
  python -m pytest tests/ -q 2>&1 | tee logs/pytest_r5.log | tail -8
grep -E "[0-9]+ (passed|failed)" logs/pytest_r5.log \
  > logs/evidence/pytest_r5.txt || true
commit_evidence "Evidence: round-5 full pytest tail"
