#!/bin/bash
# Dropbox RSSM-only table leg: replaces the withdrawn pre-float64-fix
# negative-FVD cell (PROGRESS.md round-3 table footnote). Same flags as
# model_table.sh's Dropbox column (reference kicker presets, WIN=25 PRM=1)
# but only the phases the RSSM cell needs — collect, arbiter, RSSM train,
# RSSM eval. The BVAE/RNLDA encoder stages are skipped because the FBT/FRNLD
# Dropbox cells stand from round 3 (they postdate the FID dtype fix).
# Usage: dropbox_rssm.sh [WORKDIR=/root/work/mtable]
set -euo pipefail
MT=${1:-/root/work/mtable}
D=$MT/Dropbox
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

# quick validation that the i8->i1 Mosaic fix (bool-constant manifold tiles
# in mf_cc/mf_pc) lets the pair-env megakernel compile on the real chip —
# runs here because this is the first TPU slot after the fix landed; the
# full BENCH_MATRIX pair-row regen is scheduled separately once this passes
if ! grep -q vs_baseline logs/bench_luxocube_mega.log 2>/dev/null; then
  timeout --signal=TERM --kill-after=60 1200 \
    env BENCH_ENV=LuxoCube BENCH_SOLVER=mega python bench.py 2>&1 \
    | tee -a logs/bench_luxocube_mega.log | tail -3 || true
fi

if [ ! -d $D/data/train ] || [ "$(ls $D/data/train | wc -l)" -lt 100 ]; then
  python -m research.main --mode=collect --env=Dropbox --logdir=$D/data \
    --train_barrels=100 --test_barrels=10 --num_envs=4000 \
    --barrel_format=native
fi
[ -f $D/arbiter/MultiStepArbiter.pkl ] || python -m research.main \
  --mode=train --model=MultiStepArbiter --env=Dropbox --datadir=$D/data \
  --logdir=$D/arbiter --total_itr=30000 --bs=32 --window=5 --log_n=5000 \
  --device_dataset=1 --hidden_size=256 --nfilter=64
[ -f $D/RSSM/RSSM.pkl ] || python -m research.main --mode=train \
  --model=RSSM --env=Dropbox --datadir=$D/data --logdir=$D/RSSM \
  --total_itr=100000 --bs=32 --window=25 --prompt_n=1 --log_n=20000 \
  --device_dataset=1 --nfilter=64 --hidden_size=300 --free_nats=0.01
[ -f $MT/eval/RSSM/Dropbox/logger.pkl ] || python -m research.main \
  --mode=eval --model=RSSM --env=Dropbox --datadir=$D/data \
  --weightdir=$D/RSSM --arbiterdir=$D/arbiter \
  --logdir=$MT/eval/RSSM/Dropbox --bs=256 --window=25 --prompt_n=1
echo "=== dropbox_rssm complete"
