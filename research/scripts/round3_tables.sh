#!/bin/bash
# Round-3 remaining evidence: model-quality table (VERDICT #6) then the
# solver-iteration A/B (VERDICT #4). One JAX process at a time; each inner
# script is resume-aware with process-level retries.
set -uo pipefail
cd "$(dirname "$0")/../.."
echo "=== round3_tables start $(date)"
bash research/scripts/model_table.sh "Dropbox Bounce Urchin Luxo" /root/work/mtable \
  2>&1 | tee -a logs/mtable.log
echo "=== model_table exit=$? $(date)"
bash research/scripts/iters_ab.sh Urchin /root/work/iters_ab \
  2>&1 | tee -a logs/iters_ab.log
echo "=== iters_ab exit=$? $(date)"
echo "=== round3_tables done $(date)"
