#!/bin/bash
# Validate + pre-warm the production-shape multichip dryrun (VERDICT r4
# weak #6): 8-device virtual CPU mesh, 4096-world collect chunk, 512-dim
# FBT train step, 128-env dream-PPO epoch. Caches compiles for the
# driver's own dryrun_multichip(8) run.
source "$(dirname "$0")/_lib.sh"
left=$(( R5_HARD_END - $(date +%s) ))
[ "$left" -lt 900 ] && { echo "no time for dryrun check"; exit 99; }
timeout --signal=TERM --kill-after=90 $(( left < 3600 ? left : 3600 )) \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
