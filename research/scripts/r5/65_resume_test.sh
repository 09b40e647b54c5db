#!/bin/bash
# CPU check of the new mode=train auto-resume path (runs in the gap between
# TPU stages so there is never a second live JAX process).
source "$(dirname "$0")/_lib.sh"
timeout --signal=TERM --kill-after=60 1800 \
  env PYTHONPATH= JAX_PLATFORMS=cpu \
  python -m pytest tests/test_resume.py tests/test_dp8_chain.py -q 2>&1 \
  | tee logs/r5q/resume_test.log | tail -4
grep -E "[0-9]+ (passed|failed)" logs/r5q/resume_test.log \
  > logs/evidence/resume_test.txt || true
commit_evidence "Evidence: auto-resume regression test on CPU"
