#!/bin/bash
# Bounce model-table column (VERDICT r4 missing #3): 4 models at reference
# kicker budgets via the resume-aware model_table.sh, then render the table.
source "$(dirname "$0")/_lib.sh"
MT=/root/work/mtable
mkdir -p "$MT"
tpu_guard 1800
retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 12000)" \
  bash research/scripts/model_table.sh "Bounce" "$MT"
for M in RSSM FIT FBT FRNLD; do
  if [ -f "$MT/eval/$M/Bounce/logger.pkl" ]; then
    mkdir -p "logs/evidence/mtable/${M}_Bounce"
    cp "$MT/eval/$M/Bounce/logger.pkl" "logs/evidence/mtable/${M}_Bounce/"
  fi
done
python -m research.scripts.metrics_table --logdir=$MT/eval \
  --models=RSSM,FIT,FBT,FRNLD --envs=Dropbox,Bounce 2>&1 \
  | tee logs/evidence/mtable/table_r5.txt || true
commit_evidence "Evidence: Bounce model-table column (logger.pkl digests)"
