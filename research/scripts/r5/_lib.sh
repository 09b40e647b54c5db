# Shared helpers for round-5 stages (sourced; runner exports R5_TPU_DEADLINE
# and R5_HARD_END). All stages run from the repo root.
cd "$(dirname "${BASH_SOURCE[0]}")/../../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
mkdir -p logs/evidence
# live deadline override: stages re-source this file, so writing a new
# epoch into logs/r5q/TPU_DEADLINE extends/shrinks the TPU window mid-round
if [ -s logs/r5q/TPU_DEADLINE ]; then
  R5_TPU_DEADLINE=$(cat logs/r5q/TPU_DEADLINE)
fi

tpu_left() {
  # re-read the override file on EVERY call: long-running stages must see
  # mid-round deadline extensions (sourcing _lib once at stage start is not
  # enough — the builder bumps the file while stages run)
  if [ -s logs/r5q/TPU_DEADLINE ]; then
    R5_TPU_DEADLINE=$(cat logs/r5q/TPU_DEADLINE)
  fi
  echo $(( R5_TPU_DEADLINE - $(date +%s) ))
}

tpu_guard() {  # exit the stage early if the TPU window is (nearly) spent
  if [ "$(tpu_left)" -lt "${1:-420}" ]; then
    echo "=== tpu_guard: only $(tpu_left)s of TPU window left; skipping"
    exit 99
  fi
}

cap_tpu() {  # min(requested cap, remaining TPU window)
  local want=$1 left
  left=$(tpu_left)
  [ "$want" -gt "$left" ] && want=$left
  echo "$want"
}

retry1() {  # retry once on real failures, not on cap-kill (124/137)
  "$@"
  local rc=$?
  if [ $rc -ne 0 ] && [ $rc -ne 124 ] && [ $rc -ne 137 ]; then
    echo "=== failed rc=$rc; retrying once in 120s" >&2
    sleep 120
    "$@"; rc=$?
  fi
  return $rc
}

commit_evidence() {  # commit durable artifacts; never fail the stage
  git add -A logs/evidence logs/figs BENCH_MATRIX.json 2>/dev/null
  git diff --cached --quiet || git commit -m "$1" || true
}
