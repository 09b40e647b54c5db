#!/bin/bash
# Dropbox RSSM table cell redo under the float64 FID fix (VERDICT r4
# missing #3). Wraps the existing resume-aware leg script.
source "$(dirname "$0")/_lib.sh"
MT=/root/work/mtable
mkdir -p "$MT"
tpu_guard 1800
retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 9000)" \
  bash research/scripts/dropbox_rssm.sh "$MT"
if [ -f "$MT/eval/RSSM/Dropbox/logger.pkl" ]; then
  mkdir -p logs/evidence/mtable/RSSM_Dropbox
  cp "$MT/eval/RSSM/Dropbox/logger.pkl" logs/evidence/mtable/RSSM_Dropbox/
fi
commit_evidence "Evidence: Dropbox RSSM eval under float64 FID"
