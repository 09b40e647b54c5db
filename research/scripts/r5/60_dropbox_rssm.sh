#!/bin/bash
# Dropbox RSSM table cell redo under the float64 FID fix (VERDICT r4
# missing #3) — chunked-progressive variant for the final round: train in
# timeout slices (the Trainer saves every 300s and resumes from the
# checkpoint step via --weightdir), eval + commit evidence after the first
# slice and then every >=15k steps, so ANY TPU-window length yields a
# durable, honestly-labeled cell; the full 100k reference budget
# (kicker.py:57-79) if the window allows.
source "$(dirname "$0")/_lib.sh"
MT=/root/work/mtable
D=$MT/Dropbox
EV=logs/evidence/mtable/RSSM_Dropbox
mkdir -p "$MT" "$EV"
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

echo "=== [Dropbox] collect $(date)"
if ! { [ -d $D/data/train ] && [ "$(ls $D/data/train | wc -l)" -ge 100 ]; }; then
  retry1 timeout --signal=TERM --kill-after=90 "$(cap_tpu 2700)" \
    python -m research.main --mode=collect --env=Dropbox --logdir=$D/data \
    --train_barrels=100 --test_barrels=10 --num_envs=4000 \
    --barrel_format=native || exit 1
fi

echo "=== [Dropbox] arbiter $(date)"
# step-aware resume gate (a timeout-cut train leaves a partial .pkl that a
# bare -f test would wrongly treat as done)
ARB_STEP=$(step_of $D/arbiter/MultiStepArbiter.pkl)
while [ "$ARB_STEP" -lt 30000 ]; do
  tpu_guard 600
  W=""
  [ "$ARB_STEP" -gt 0 ] && W="--weightdir=$D/arbiter"
  timeout --signal=TERM --kill-after=90 "$(cap_tpu 2400)" \
    python -m research.main --mode=train --model=MultiStepArbiter \
    --env=Dropbox --datadir=$D/data --logdir=$D/arbiter --total_itr=30000 \
    --bs=32 --window=5 --log_n=5000 --device_dataset=1 --hidden_size=256 \
    --nfilter=64 $W
  rc=$?
  NEW=$(step_of $D/arbiter/MultiStepArbiter.pkl)
  echo "=== arbiter slice rc=$rc step $ARB_STEP -> $NEW"
  if [ "$NEW" -le "$ARB_STEP" ] && [ $rc -ne 0 ]; then
    [ $rc -eq 124 ] || [ $rc -eq 137 ] || sleep 120  # tunnel hiccup backoff
  fi
  ARB_STEP=$NEW
done

run_eval() {  # $1 = step label for the evidence files
  rm -rf $MT/eval/RSSM/Dropbox
  timeout --signal=TERM --kill-after=90 "$(cap_tpu 1800)" \
    python -m research.main --mode=eval --model=RSSM --env=Dropbox \
    --datadir=$D/data --weightdir=$D/RSSM --arbiterdir=$D/arbiter \
    --logdir=$MT/eval/RSSM/Dropbox --bs=256 --window=25 --prompt_n=1
  if [ -f $MT/eval/RSSM/Dropbox/logger.pkl ]; then
    cp $MT/eval/RSSM/Dropbox/logger.pkl "$EV/"
    python -m research.scripts.metrics_table --logdir=$MT/eval \
      --models=RSSM --envs=Dropbox > "$EV/table_step$1.txt" 2>&1 || true
    printf '{"env": "Dropbox", "model": "RSSM", "train_step": %s, "budget": 100000, "note": "float64-FID re-eval of the withdrawn cell"}\n' "$1" > "$EV/meta.json"
    commit_evidence "Evidence: Dropbox RSSM eval (float64 FID) at step $1"
    return 0
  fi
  return 1
}

LAST_EVAL=0
CHUNK=600  # short first slice: lock in a cell early, then widen
while :; do
  S=$(step_of $D/RSSM/RSSM.pkl)
  [ "$S" -ge 100000 ] && break
  LEFT=$(tpu_left)
  [ $(( LEFT - 900 )) -lt 300 ] && break  # keep an eval reserve
  CAP=$(( LEFT - 900 )); [ $CAP -gt $CHUNK ] && CAP=$CHUNK
  W=""
  [ "$S" -gt 0 ] && W="--weightdir=$D/RSSM"
  echo "=== [Dropbox] RSSM slice from step $S cap=${CAP}s $(date)"
  timeout --signal=TERM --kill-after=90 "$CAP" \
    python -m research.main --mode=train --model=RSSM --env=Dropbox \
    --datadir=$D/data --logdir=$D/RSSM --total_itr=100000 --bs=32 \
    --window=25 --prompt_n=1 --log_n=20000 --device_dataset=1 --nfilter=64 \
    --hidden_size=300 --free_nats=0.01 $W
  rc=$?
  S2=$(step_of $D/RSSM/RSSM.pkl)
  echo "=== RSSM slice rc=$rc step $S -> $S2"
  if [ "$S2" -le "$S" ] && [ $rc -ne 0 ] && [ $rc -ne 124 ] && [ $rc -ne 137 ]; then
    sleep 120  # real failure with no progress: tunnel backoff
  fi
  if [ "$S2" -gt 0 ] && { [ "$LAST_EVAL" -eq 0 ] || \
      [ $(( S2 - LAST_EVAL )) -ge 15000 ] || [ "$S2" -ge 100000 ]; }; then
    run_eval "$S2" && LAST_EVAL=$S2
  fi
  CHUNK=1500
done

# final eval if training finished (or window closed) past the last eval
S=$(step_of $D/RSSM/RSSM.pkl)
if [ "$S" -gt "$LAST_EVAL" ] && [ "$(tpu_left)" -gt 420 ]; then
  run_eval "$S"
fi
echo "=== 60_dropbox_rssm done: step=$S last_eval=$LAST_EVAL $(date)"
