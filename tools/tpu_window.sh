#!/bin/bash
# One-shot TPU window playbook: run when the axon tunnel comes up.
# Serializes every chip job (only ONE process may own the TPU) and logs to
# the given dir. Usage: bash tools/tpu_window.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_window}
mkdir -p "$LOG"

echo "=== 1. compiled-vs-interpret-vs-golden crosscheck ==="
python tools/crosscheck_tpu.py 2>&1 | tee "$LOG/crosscheck.log"

echo "=== 2. parity benchmark (the BENCH number) ==="
python bench.py --skip-probe 2>&1 | tee "$LOG/bench_parity.log"

echo "=== 3. variant sweep (tile/chunk/bf16) ==="
python tools/bench_variants.py 2>&1 | tee "$LOG/bench_variants.log"

echo "=== done; logs in $LOG ==="
