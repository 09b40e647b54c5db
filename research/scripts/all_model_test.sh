#!/bin/bash
# Sweep-everything integration test: train every model on the env tiers
# (reference: research/scripts/all_model_test.sh). Budget-reduced smoke
# variant; pass EXTRA='--total_itr=...' to scale up.
set -e
EXTRA=${EXTRA:---total_itr=100 --log_n=50}
DATADIR=${DATADIR:-logs/data}
LOGDIR=${LOGDIR:-logs/all_model_test}

for MODEL in BVAE RNLDA VAE RSSM FIT; do
  python -m research.scripts.kicker --model=$MODEL --envs=0 \
    --datadir=$DATADIR --logdir=$LOGDIR --extra="$EXTRA"
done
# FBT/FRNLD need pretrained encoders
python -m research.scripts.kicker --model=FBT --envs=0 \
  --datadir=$DATADIR --logdir=$LOGDIR --weightdir=$LOGDIR/BVAE \
  --extra="$EXTRA"
python -m research.scripts.kicker --model=FRNLD --envs=0 \
  --datadir=$DATADIR --logdir=$LOGDIR --weightdir=$LOGDIR/RNLDA \
  --extra="$EXTRA"
