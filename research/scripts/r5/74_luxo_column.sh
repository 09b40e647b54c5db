#!/bin/bash
# Luxo model-table column at HEAD (same rationale as 73_urchin_column.sh).
source "$(dirname "$0")/_lib.sh"
tpu_guard 1800
source research/scripts/run_column.sh Luxo 50 3
