#!/bin/bash
# Stall watchdog for long TPU chains: the axon tunnel occasionally wedges a
# dispatch permanently (host blocked in Array._value, futex wait, ~0 CPU —
# CLAUDE.md / PROGRESS.md round-3; a round-4 wedge cost 41 min of chain
# time). Every phase of the chains is retry+resume-aware, so the cheapest
# recovery is: detect the wedge, kill the wedged python, let the chain's
# retry loop relaunch it.
#
# Detection is deliberately two-factor to avoid killing healthy phases:
#   1. the chain log has not been MODIFIED for STALE_S seconds (covers
#      stdout block-buffering lag: healthy phases flush at worst every few
#      minutes), AND
#   2. every python descendant of ROOT_PID grew less than CPU_THRESH
#      jiffies over a 60 s window (a compiling process burns a full core;
#      a healthy training host does numpy work every epoch; the observed
#      wedge signature is ~0.2%/min from a lone socket-poll thread).
# Kills are by explicit descendant PID (never by name/pattern), SIGTERM
# then SIGKILL for survivors. Exits when ROOT_PID does.
#
# Usage: stall_watchdog.sh ROOT_PID LOGFILE [STALE_S=900] [CPU_THRESH=30]
set -u
ROOT=${1:?root pid}
LOG=${2:?chain logfile}
STALE=${3:-900}
CPUTHRESH=${4:-30}

descendants() {
  local p out=""
  for p in $(cat /proc/"$1"/task/*/children 2>/dev/null); do
    out="$out $p $(descendants "$p")"
  done
  echo "$out"
}

cpu_of() { awk '{print $14+$15}' /proc/"$1"/stat 2>/dev/null; }

echo "watchdog: root=$ROOT log=$LOG stale=${STALE}s thresh=${CPUTHRESH}j/min"
while kill -0 "$ROOT" 2>/dev/null; do
  sleep 60
  [ -f "$LOG" ] || continue
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  [ "$age" -lt "$STALE" ] && continue
  pys=""
  for p in $(descendants "$ROOT"); do
    case "$(cat /proc/"$p"/comm 2>/dev/null)" in
      python*) pys="$pys $p" ;;
    esac
  done
  [ -z "${pys// /}" ] && continue
  declare -A c0=()
  for p in $pys; do c0[$p]=$(cpu_of "$p"); done
  sleep 60
  busy=0
  for p in $pys; do
    c1=$(cpu_of "$p")
    [ -z "$c1" ] && continue            # already exited
    d=$(( c1 - ${c0[$p]:-0} ))
    [ "$d" -ge "$CPUTHRESH" ] && busy=1
  done
  if [ "$busy" -eq 0 ]; then
    echo "$(date) watchdog: log stale ${age}s + idle pythons:$pys -> SIGTERM"
    for p in $pys; do kill "$p" 2>/dev/null; done
    sleep 30
    for p in $pys; do
      kill -0 "$p" 2>/dev/null && {
        echo "$(date) watchdog: $p survived SIGTERM -> SIGKILL"
        kill -9 "$p" 2>/dev/null
      }
    done
  fi
done
echo "$(date) watchdog: root $ROOT exited; done"
