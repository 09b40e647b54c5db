#!/bin/bash
# One full model-table column (reference protocol: scripts/script.py:6-51 +
# kicker presets): collect -> arbiter -> BVAE/RNLDA encoders -> 4 video
# models at 1e5 iters -> Evaler per model, all chunked-progressive (timeout
# slices + mode=train auto-resume + periodic checkpoints) with step-labeled
# evidence committed per cell into logs/evidence/mtable/.
# Usage: run_column.sh ENV WIN PRM   (sourced _lib provides tpu_left etc.;
# callers are r5 queue stages)
ENVN=${1:?env}
WIN=${2:-50}
PRM=${3:-3}
MT=/root/work/mtable
D=$MT/$ENVN
mkdir -p "$MT" logs/evidence/mtable

step_of() {
  python - "$1" <<'EOF'
import pickle, sys
try:
  print(int(pickle.load(open(sys.argv[1], 'rb')).get('step', 0)))
except Exception:
  print(0)
EOF
}

chunk_train() {  # $1=model $2=logdir $3=total_itr $4=chunk_s $5...=flags
  local M=$1 LD=$2 TOT=$3 CHUNK=$4; shift 4
  local S S2 rc CAP LEFT
  while :; do
    S=$(step_of $LD/$M.pkl)
    [ "$S" -ge "$TOT" ] && return 0
    LEFT=$(tpu_left)
    [ $(( LEFT - 900 )) -lt 300 ] && return 1
    CAP=$(( LEFT - 900 )); [ $CAP -gt $CHUNK ] && CAP=$CHUNK
    echo "=== [$ENVN] $M slice from step $S cap=${CAP}s $(date)"
    timeout --signal=TERM --kill-after=90 "$CAP" \
      python -m research.main --mode=train --model=$M --env=$ENVN \
      --datadir=$D/data --logdir=$LD --total_itr=$TOT --bs=32 \
      --device_dataset=1 --log_n=5000 "$@"
    rc=$?
    S2=$(step_of $LD/$M.pkl)
    echo "=== $M slice rc=$rc step $S -> $S2"
    if [ "$S2" -le "$S" ] && [ $rc -ne 0 ] && [ $rc -ne 124 ] && [ $rc -ne 137 ]; then
      sleep 120
    fi
  done
}

eval_model() {
  local M=$1 S
  S=$(step_of $D/$M/$M.pkl)
  [ "$S" -le 0 ] && return 1
  [ "$(tpu_left)" -lt 600 ] && return 1
  local EV=logs/evidence/mtable/${M}_${ENVN}
  mkdir -p "$EV"
  [ -f "$EV/table_step$S.txt" ] && return 0
  rm -rf $MT/eval/$M/$ENVN
  timeout --signal=TERM --kill-after=90 "$(cap_tpu 1800)" \
    python -m research.main --mode=eval --model=$M --env=$ENVN \
    --datadir=$D/data --weightdir=$D/$M --arbiterdir=$D/arbiter \
    --logdir=$MT/eval/$M/$ENVN --bs=256 --window=$WIN --prompt_n=$PRM
  if [ -f $MT/eval/$M/$ENVN/logger.pkl ]; then
    cp $MT/eval/$M/$ENVN/logger.pkl "$EV/"
    python -m research.scripts.metrics_table --logdir=$MT/eval \
      --models=$M --envs=$ENVN > "$EV/table_step$S.txt" 2>&1 || true
    printf '{"env": "%s", "model": "%s", "train_step": %s, "budget": 100000}\n' "$ENVN" "$M" "$S" > "$EV/meta.json"
    commit_evidence "Evidence: $ENVN $M eval at step $S"
  fi
}

echo "=== [$ENVN] collect $(date)"
if ! { [ -d $D/data/train ] && [ "$(ls $D/data/train | wc -l)" -ge 100 ]; }; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2700)" \
    python -m research.main --mode=collect --env=$ENVN --logdir=$D/data \
    --train_barrels=100 --test_barrels=10 --num_envs=4000 \
    --barrel_format=native || return 1 2>/dev/null || exit 1
fi

chunk_train MultiStepArbiter $D/arbiter 30000 1200 \
  --window=5 --hidden_size=256 --nfilter=64 || exit 99
chunk_train BVAE $D/bvae 30000 1200 \
  --window=5 --hidden_size=64 --vqK=64 --vqD=16 --nfilter=16 || exit 99
chunk_train RNLDA $D/rnlda 30000 1200 \
  --window=5 --hidden_size=64 --vqK=64 --vqD=8 --nfilter=16 || exit 99

for M in RSSM FIT FBT FRNLD; do
  case $M in
    RSSM)  FLAGS="--nfilter=64 --hidden_size=300 --free_nats=0.01" ;;
    FIT)   FLAGS="--n_layer=2 --n_head=4 --n_embed=256 --hidden_size=256" ;;
    FBT)   FLAGS="--n_layer=4 --n_head=8 --n_embed=512 --hidden_size=512 --weightdir=$D/bvae" ;;
    FRNLD) FLAGS="--n_layer=4 --n_head=8 --n_embed=512 --hidden_size=512 --weightdir=$D/rnlda" ;;
  esac
  chunk_train $M $D/$M 100000 1800 --window=$WIN --prompt_n=$PRM \
    --log_n=20000 $FLAGS || break
  eval_model $M
done

python -m research.scripts.metrics_table --logdir=$MT/eval \
  --models=RSSM,FIT,FBT,FRNLD --envs=Dropbox,Bounce,Urchin,Luxo 2>&1 \
  | tee logs/evidence/mtable/table_r5.txt || true
commit_evidence "Evidence: $ENVN model-table column at HEAD"
echo "=== run_column $ENVN done $(date)"
