#!/bin/bash
# Model-quality table protocol (reference: scripts/script.py:6-51 +
# kicker.py presets): per env — collect, train the MultiStepArbiter, train
# each world model at reference budgets (encoders 3e4 iters, video models
# 1e5 iters, bs=32; kicker.py:19-51,123-126), Evaler -> logger.pkl, then
# metrics_table.py renders the FVD/SSIM/PSNR/cosdist table.
# Usage: model_table.sh "Urchin Luxo" /tmp/mtable [VIDEO_ITRS] [ENC_ITRS]
# Runs on the real TPU. One JAX process at a time.
set -euo pipefail
ENVS=${1:-"Dropbox Bounce Urchin Luxo"}
WORK=${2:-/tmp/mtable}
VID=${3:-100000}
ENC=${4:-30000}
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
mkdir -p "$WORK"

# Tunnel sessions can be transiently poisoned (PROGRESS.md round-3): every
# phase is resume-aware, dies fast in-process, and is retried at the
# process level with waits matched to the observed multi-minute bad periods.
retry() {
  local waits=(30 120 300 600 600 600)
  for i in 0 1 2 3 4 5; do
    "$@" && return 0
    echo "=== phase failed (attempt $((i+1))); retrying in ${waits[$i]}s" >&2
    sleep "${waits[$i]}"
  done
  return 1
}

for ENV in $ENVS; do
  D=$WORK/$ENV
  # reference per-env video window/prompt (kicker.py:46-49: ENV_WINDOW
  # defaults to 50 with Dropbox=25; ENV_PROMPT defaults to 3 with Dropbox=1;
  # kicker's --prompt abbreviates argparse's --prompt_n)
  case $ENV in
    Dropbox) WIN=25; PRM=1 ;;
    *)       WIN=50; PRM=3 ;;
  esac
  echo "=== [$ENV] collect"
  [ -d $D/data/train ] && [ "$(ls $D/data/train | wc -l)" -ge 100 ] || \
    retry python -m research.main --mode=collect --env=$ENV \
    --logdir=$D/data --train_barrels=100 --test_barrels=10 --num_envs=4000 \
    --barrel_format=native

  echo "=== [$ENV] arbiter"
  # reference arbiter preset (kicker.py:137: --nfilter=64 --hidden_size=256
  # --window=5)
  [ -f $D/arbiter/MultiStepArbiter.pkl ] || retry python -m research.main \
    --mode=train --model=MultiStepArbiter --env=$ENV --datadir=$D/data \
    --logdir=$D/arbiter --total_itr=$ENC --bs=32 --window=5 \
    --log_n=5000 --device_dataset=1 --hidden_size=256 --nfilter=64

  echo "=== [$ENV] BVAE (FBT dependency)"
  [ -f $D/bvae/BVAE.pkl ] || retry python -m research.main --mode=train \
    --model=BVAE --env=$ENV --datadir=$D/data --logdir=$D/bvae \
    --total_itr=$ENC --bs=32 --window=5 --log_n=5000 --device_dataset=1 \
    --hidden_size=64 --vqK=64 --vqD=16 --nfilter=16

  echo "=== [$ENV] RNLDA (FRNLD dependency)"
  [ -f $D/rnlda/RNLDA.pkl ] || retry python -m research.main --mode=train \
    --model=RNLDA --env=$ENV --datadir=$D/data --logdir=$D/rnlda \
    --total_itr=$ENC --bs=32 --window=5 --log_n=5000 --device_dataset=1 \
    --hidden_size=64 --vqK=64 --vqD=8 --nfilter=16

  for M in RSSM FIT FBT FRNLD; do
    # model presets from kicker.py:57-79; window/prompt_n are the per-env
    # reference values (ENV_WINDOW/ENV_PROMPT above)
    case $M in
      RSSM) FLAGS="--nfilter=64 --hidden_size=300 --free_nats=0.01" ;;
      FIT)  FLAGS="--n_layer=2 --n_head=4 --n_embed=256 --hidden_size=256" ;;
      FBT)  FLAGS="--n_layer=4 --n_head=8 --n_embed=512 --hidden_size=512 --weightdir=$WORK/$ENV/bvae" ;;
      FRNLD) FLAGS="--n_layer=4 --n_head=8 --n_embed=512 --hidden_size=512 --weightdir=$WORK/$ENV/rnlda" ;;
    esac
    echo "=== [$ENV] train $M"
    [ -f $D/$M/$M.pkl ] || retry python -m research.main --mode=train --model=$M \
      --env=$ENV --datadir=$D/data --logdir=$D/$M --total_itr=$VID --bs=32 \
      --window=$WIN --prompt_n=$PRM --log_n=20000 --device_dataset=1 $FLAGS
    echo "=== [$ENV] eval $M"
    # eval bs=256: the Evaler pools a fixed eval_n samples, so batch size
    # only changes dispatch granularity, not the estimator; big batches
    # amortize the axon tunnel round-trip (the jitted per-batch eval step)
    [ -f $WORK/eval/$M/$ENV/logger.pkl ] || retry python -m research.main \
      --mode=eval --model=$M --env=$ENV --datadir=$D/data \
      --weightdir=$D/$M --arbiterdir=$D/arbiter \
      --logdir=$WORK/eval/$M/$ENV --bs=256 --window=$WIN --prompt_n=$PRM
  done
done

echo "=== metrics table"
python -m research.scripts.metrics_table --logdir=$WORK/eval \
  --models=RSSM,FIT,FBT,FRNLD --envs=${ENVS// /,}
echo "=== model_table complete: $WORK"

# one-shot rider (round 4): regenerate whatever BENCH_MATRIX rows are still
# missing a mega-path measurement at HEAD (the pre-Mosaic-fix regen fell
# back to jnp on pair envs and could be cap-killed before writing anything).
# Only runs once the on-chip LuxoCube compile check validated the fix.
# Incremental: BENCH_MATRIX_ENVS keeps the other envs' rows.
NEED=$(python - <<'EOF'
import json
try:
  rows = json.load(open('BENCH_MATRIX.json'))
except Exception:
  rows = []
have = {(r['env'], r.get('solver')) for r in rows if 'exit_tol' in r}
print(','.join(e for e in ('Urchin', 'LuxoCube', 'Object3', 'Bounce2')
               if (e, 'mega') not in have))
EOF
) || NEED=""
if [ -n "$NEED" ] && grep -q vs_baseline logs/bench_luxocube_mega.log \
    2>/dev/null; then
  echo "=== matrix row regen for: $NEED (post-Mosaic-fix)"
  timeout --signal=TERM --kill-after=90 5400 env BENCH_MATRIX=1 \
    BENCH_MATRIX_ENVS="$NEED" python bench.py 2>&1 \
    | tee -a logs/bench_matrix_pairs.log | tail -4 || true
fi
