#!/bin/bash
# Dropbox FIT/FBT/FRNLD re-train + re-eval under the SAME freshly-trained
# arbiter as the round-5 RSSM cell (stage 60): the round-3 cells' arbiter
# checkpoint was lost to a VM reset, so re-evaling all four models against
# one arbiter makes the Dropbox column internally consistent (FVD depends
# on the feature net). Same reference kicker budgets; chunked-progressive
# like stage 70.
source "$(dirname "$0")/_lib.sh"
MT=/root/work/mtable
D=$MT/Dropbox
mkdir -p logs/evidence/mtable
tpu_guard 900

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
    echo "=== [Dropbox] $M slice from step $S cap=${CAP}s $(date)"
    timeout --signal=TERM --kill-after=90 "$CAP" \
      python -m research.main --mode=train --model=$M --env=Dropbox \
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
  local EV=logs/evidence/mtable/${M}_Dropbox
  mkdir -p "$EV"
  [ -f "$EV/table_step$S.txt" ] && return 0
  rm -rf $MT/eval/$M/Dropbox
  timeout --signal=TERM --kill-after=90 "$(cap_tpu 1800)" \
    python -m research.main --mode=eval --model=$M --env=Dropbox \
    --datadir=$D/data --weightdir=$D/$M --arbiterdir=$D/arbiter \
    --logdir=$MT/eval/$M/Dropbox --bs=256 --window=25 --prompt_n=1
  if [ -f $MT/eval/$M/Dropbox/logger.pkl ]; then
    cp $MT/eval/$M/Dropbox/logger.pkl "$EV/"
    python -m research.scripts.metrics_table --logdir=$MT/eval \
      --models=$M --envs=Dropbox > "$EV/table_step$S.txt" 2>&1 || true
    printf '{"env": "Dropbox", "model": "%s", "train_step": %s, "budget": 100000, "note": "re-eval under the stage-60 arbiter for column consistency"}\n' "$M" "$S" > "$EV/meta.json"
    commit_evidence "Evidence: Dropbox $M eval at step $S (stage-60 arbiter)"
  fi
}

# encoders (reference presets, kicker.py:123-137)
chunk_train BVAE $D/bvae 30000 1200 \
  --window=5 --hidden_size=64 --vqK=64 --vqD=16 --nfilter=16 || exit 99
chunk_train RNLDA $D/rnlda 30000 1200 \
  --window=5 --hidden_size=64 --vqK=64 --vqD=8 --nfilter=16 || exit 99

for M in FIT FBT FRNLD; do
  case $M in
    FIT)   FLAGS="--n_layer=2 --n_head=4 --n_embed=256 --hidden_size=256" ;;
    FBT)   FLAGS="--n_layer=4 --n_head=8 --n_embed=512 --hidden_size=512 --weightdir=$D/bvae" ;;
    FRNLD) FLAGS="--n_layer=4 --n_head=8 --n_embed=512 --hidden_size=512 --weightdir=$D/rnlda" ;;
  esac
  chunk_train $M $D/$M 100000 1800 --window=25 --prompt_n=1 \
    --log_n=20000 $FLAGS || break
  eval_model $M
done

python -m research.scripts.metrics_table --logdir=$MT/eval \
  --models=RSSM,FIT,FBT,FRNLD --envs=Dropbox,Bounce 2>&1 \
  | tee logs/evidence/mtable/table_r5.txt || true
commit_evidence "Evidence: Dropbox column re-evaled under one arbiter"
echo "=== 72_dropbox_column done $(date)"
