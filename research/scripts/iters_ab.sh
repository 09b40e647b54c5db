#!/bin/bash
# A/B: does the 8/4 solver-iteration default change learned-model quality
# vs the reference's 180/60 (VERDICT round-2 weak #2)? Same budgets, same
# env, same model family (BVAE -> FBT), one dataset per iteration setting;
# Evaler metrics (FVD/SSIM/PSNR/cosdist vs a per-dataset arbiter) compare
# how well the world model captures its own physics at each setting.
# Usage: iters_ab.sh [ENV] [WORKDIR]
# Runs on the real TPU. One JAX process at a time.
set -euo pipefail
ENV=${1:-Urchin}
WORK=${2:-/root/work/iters_ab}
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
mkdir -p "$WORK"

retry() {
  local waits=(30 120 300 600 600 600)
  for i in 0 1 2 3 4 5; do
    "$@" && return 0
    echo "=== phase failed (attempt $((i+1))); retrying in ${waits[$i]}s" >&2
    sleep "${waits[$i]}"
  done
  return 1
}

for SETTING in "8 4" "180 60"; do
  read -r VI PI <<< "$SETTING"
  D=$WORK/$ENV-$VI-$PI
  ITERS="--vel_iters=$VI --pos_iters=$PI"
  echo "=== [$ENV $VI/$PI] collect"
  [ -d $D/data/train ] && [ "$(ls $D/data/train | wc -l)" -ge 100 ] || \
    retry python -m research.main --mode=collect --env=$ENV $ITERS \
      --logdir=$D/data --train_barrels=100 --test_barrels=10 \
      --num_envs=4000 --barrel_format=native

  echo "=== [$ENV $VI/$PI] arbiter"
  [ -f $D/arbiter/MultiStepArbiter.pkl ] || retry python -m research.main \
    --mode=train --model=MultiStepArbiter --env=$ENV $ITERS \
    --datadir=$D/data --logdir=$D/arbiter --total_itr=30000 --bs=32 \
    --window=5 --log_n=5000 --device_dataset=1 --hidden_size=256 \
    --nfilter=64

  echo "=== [$ENV $VI/$PI] BVAE"
  [ -f $D/bvae/BVAE.pkl ] || retry python -m research.main --mode=train \
    --model=BVAE --env=$ENV $ITERS --datadir=$D/data --logdir=$D/bvae \
    --total_itr=30000 --bs=32 --window=5 --log_n=5000 --device_dataset=1 \
    --hidden_size=64 --vqK=64 --vqD=16 --nfilter=16

  echo "=== [$ENV $VI/$PI] FBT"
  [ -f $D/fbt/FBT.pkl ] || retry python -m research.main --mode=train \
    --model=FBT --env=$ENV $ITERS --datadir=$D/data --weightdir=$D/bvae \
    --logdir=$D/fbt --total_itr=100000 --bs=32 --window=50 --prompt_n=3 \
    --n_embed=512 --n_head=8 --n_layer=4 --log_n=20000 --device_dataset=1

  echo "=== [$ENV $VI/$PI] eval"
  [ -f $D/eval/logger.pkl ] || retry python -m research.main --mode=eval \
    --model=FBT --env=$ENV $ITERS --datadir=$D/data --weightdir=$D/fbt \
    --arbiterdir=$D/arbiter --logdir=$D/eval --bs=256 --window=50 --prompt_n=3
done

echo "=== A/B results"
python - "$WORK" "$ENV" <<'EOF'
import pickle, sys
from pathlib import Path
work, env = sys.argv[1], sys.argv[2]
for tag in (f'{env}-8-4', f'{env}-180-60'):
  p = Path(work) / tag / 'eval' / 'logger.pkl'
  if not p.exists():
    print(tag, 'missing'); continue
  with open(p, 'rb') as f:
    t = pickle.load(f)
  keep = {k: v for k, v in t.items() if k.startswith('test:')}
  print(tag, {k: (round(float(v[0]), 4), round(float(v[1]), 4))
              for k, v in sorted(keep.items())})
EOF
echo "=== iters_ab complete: $WORK"
