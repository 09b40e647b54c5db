#!/bin/bash
# Clean-data rerun of the headline chain after the round-3 silent raster
# corruption fix (PROGRESS.md): quarantines every artifact derived from the
# corrupted dataset (data/bvae/fbt/ppo_lenv), keeps ppo_real (its fused
# 128-world rollouts rendered below the corruption scale; eval 0.998),
# then re-runs the resume-aware chain — only the quarantined phases rerun.
set -uo pipefail
cd "$(dirname "$0")/../.."
W=${1:-/root/work/headline_luxo}
Q=/root/work/corrupt_r3
if [ ! -f "$Q/.quarantined" ]; then
  mkdir -p "$Q"
  for d in data bvae fbt ppo_lenv; do
    [ -e "$W/$d" ] && mv "$W/$d" "$Q/$d"
  done
  touch "$Q/.quarantined"
fi
exec bash research/scripts/headline_rl.sh "${2:-Luxo}" "$W"
