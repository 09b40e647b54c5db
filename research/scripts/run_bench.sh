#!/bin/bash
# End-of-round benchmark sweep on the real chip: the full env x iters x
# solver matrix into BENCH_MATRIX.json, then the headline line.
set -euo pipefail
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
BENCH_MATRIX=1 python bench.py
