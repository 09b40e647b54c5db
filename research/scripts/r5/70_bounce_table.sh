#!/bin/bash
# Bounce model-table column (VERDICT r4 missing #3) at reference kicker
# budgets, chunked-progressive: every train runs in timeout slices with a
# step-aware resume gate (a bare [ -f pkl ] gate would treat a mid-slice
# kill as "done"), and each video model is evaled + committed as soon as it
# has a checkpoint — so a cut window still leaves honestly-labeled cells.
source "$(dirname "$0")/_lib.sh"
MT=/root/work/mtable
D=$MT/Bounce
mkdir -p "$MT" logs/evidence/mtable
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
  # resume is automatic: research.main reloads an existing <logdir>/<M>.pkl
  # (params+opt_state+step+RNG) and train_device checkpoints every 300s, so
  # each timeout slice continues where the last one died. --weightdir stays
  # reserved for the FBT/FRNLD encoder (fbt.py:91, frnld.py:49).
  local M=$1 LD=$2 TOT=$3 CHUNK=$4; shift 4
  local S S2 rc CAP LEFT
  while :; do
    S=$(step_of $LD/$M.pkl)
    [ "$S" -ge "$TOT" ] && return 0
    LEFT=$(tpu_left)
    [ $(( LEFT - 900 )) -lt 300 ] && return 1
    CAP=$(( LEFT - 900 )); [ $CAP -gt $CHUNK ] && CAP=$CHUNK
    echo "=== [Bounce] $M slice from step $S cap=${CAP}s $(date)"
    timeout --signal=TERM --kill-after=90 "$CAP" \
      python -m research.main --mode=train --model=$M --env=Bounce \
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

eval_model() {  # $1=model; evidence labeled with the achieved step
  local M=$1 S
  S=$(step_of $D/$M/$M.pkl)
  [ "$S" -le 0 ] && return 1
  [ "$(tpu_left)" -lt 600 ] && return 1
  local EV=logs/evidence/mtable/${M}_Bounce
  mkdir -p "$EV"
  # skip if we already evaled this exact step
  [ -f "$EV/table_step$S.txt" ] && return 0
  rm -rf $MT/eval/$M/Bounce
  timeout --signal=TERM --kill-after=90 "$(cap_tpu 1800)" \
    python -m research.main --mode=eval --model=$M --env=Bounce \
    --datadir=$D/data --weightdir=$D/$M --arbiterdir=$D/arbiter \
    --logdir=$MT/eval/$M/Bounce --bs=256 --window=50 --prompt_n=3
  if [ -f $MT/eval/$M/Bounce/logger.pkl ]; then
    cp $MT/eval/$M/Bounce/logger.pkl "$EV/"
    python -m research.scripts.metrics_table --logdir=$MT/eval \
      --models=$M --envs=Bounce > "$EV/table_step$S.txt" 2>&1 || true
    printf '{"env": "Bounce", "model": "%s", "train_step": %s, "budget": 100000}\n' "$M" "$S" > "$EV/meta.json"
    commit_evidence "Evidence: Bounce $M eval at step $S"
  fi
}

echo "=== [Bounce] collect $(date)"
if ! { [ -d $D/data/train ] && [ "$(ls $D/data/train | wc -l)" -ge 100 ]; }; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2700)" \
    python -m research.main --mode=collect --env=Bounce --logdir=$D/data \
    --train_barrels=100 --test_barrels=10 --num_envs=4000 \
    --barrel_format=native || exit 1
fi

# encoders + arbiter (reference presets, kicker.py:123-137)
chunk_train MultiStepArbiter $D/arbiter 30000 1200 \
  --window=5 --hidden_size=256 --nfilter=64 || exit 99
chunk_train BVAE $D/bvae 30000 1200 \
  --window=5 --hidden_size=64 --vqK=64 --vqD=16 --nfilter=16 || exit 99
chunk_train RNLDA $D/rnlda 30000 1200 \
  --window=5 --hidden_size=64 --vqK=64 --vqD=8 --nfilter=16 || exit 99

# video models: train in slices; eval whenever a model gains >=15k steps
declare -A LAST
for PASS in 1 2 3 4 5 6 7 8; do
  PROGRESS=0
  for M in RSSM FIT FBT FRNLD; do
    case $M in
      RSSM)  FLAGS="--nfilter=64 --hidden_size=300 --free_nats=0.01" ;;
      FIT)   FLAGS="--n_layer=2 --n_head=4 --n_embed=256 --hidden_size=256" ;;
      FBT)   FLAGS="--n_layer=4 --n_head=8 --n_embed=512 --hidden_size=512 --weightdir=$D/bvae" ;;
      FRNLD) FLAGS="--n_layer=4 --n_head=8 --n_embed=512 --hidden_size=512 --weightdir=$D/rnlda" ;;
    esac
    S=$(step_of $D/$M/$M.pkl)
    if [ "$S" -lt 100000 ]; then
      chunk_train $M $D/$M 100000 1800 --window=50 --prompt_n=3 \
        --log_n=20000 $FLAGS
      rcx=$?
      S2=$(step_of $D/$M/$M.pkl)
      [ "$S2" -gt "$S" ] && PROGRESS=1
      if [ "$S2" -gt 0 ] && [ $(( S2 - ${LAST[$M]:-0} )) -ge 15000 ]; then
        eval_model $M && LAST[$M]=$S2
      fi
      [ $rcx -eq 1 ] && [ "$(tpu_left)" -lt 900 ] && break 2
    fi
  done
  [ "$PROGRESS" -eq 0 ] && break
done

# final evals for anything trained past its last eval
for M in RSSM FIT FBT FRNLD; do
  S=$(step_of $D/$M/$M.pkl)
  [ "$S" -gt "${LAST[$M]:-0}" ] && eval_model $M
done

# combined table across both redo columns
python -m research.scripts.metrics_table --logdir=$MT/eval \
  --models=RSSM,FIT,FBT,FRNLD --envs=Dropbox,Bounce 2>&1 \
  | tee logs/evidence/mtable/table_r5.txt || true
commit_evidence "Evidence: Bounce model-table column (chunked, step-labeled)"
echo "=== 70_bounce_table done $(date)"
