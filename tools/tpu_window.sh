#!/bin/bash
# One-shot TPU window playbook: run when the axon tunnel comes up.
# Serializes every chip job (only ONE process may own the TPU) and logs to
# the given dir. Every stage is wrapped in `timeout` so a tunnel that dies
# mid-stage can't hang the window; later stages still get a chance (the
# backend sometimes recovers between processes). Stage order: correctness
# gates first (incl. the streaming-blend Mosaic gate — interpret mode does
# not model lane alignment / scalar-carry rules), then the streaming sweep
# (this round's decision data), then the HEADLINE BENCH (also seeds
# .jax_cache with the exact executable the driver's BENCH_r03 run needs),
# then train proof and diagnostics.
# Usage: bash tools/tpu_window.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_window}
mkdir -p "$LOG"

echo "=== 1. STREAMING crosscheck (new-kernel Mosaic + fidelity gate) ==="
timeout 1500 python tools/crosscheck_tpu.py --skip-probe --streaming \
  2>&1 | tee "$LOG/crosscheck_stream.log"

echo "=== 2. base crosscheck (regression gate) ==="
timeout 1500 python tools/crosscheck_tpu.py --skip-probe 2>&1 | tee "$LOG/crosscheck.log"

echo "=== 3. streaming sweep (chunk 32/64/128 vs parity-cull) ==="
timeout 3600 python tools/bench_variants.py --skip-probe --only stream \
  2>&1 | tee "$LOG/bench_stream.log"

echo "=== 4. parity benchmark (headline + cache seed for BENCH_r03) ==="
timeout 4800 python bench.py --skip-probe 2>&1 | tee "$LOG/bench_parity.log"

echo "=== 5. batch-3 remat'd 512^2 train step (VERDICT r2 item 3a; retry ==="
echo "===    of the r8 HTTP-500 compile fail) ==="
timeout 4800 python tools/compile_train_512.py --platform axon --execute \
  --batch-size 3 --remat 2>&1 | tee "$LOG/compile_train_512_b3.log"

echo "=== 6. stage breakdown diag ==="
timeout 4800 python tools/tpu_diag.py --skip-probe \
  --stages bin2,raster2,blend,full,refiner --out "$LOG/diag" \
  2>&1 | tee "$LOG/diag.log"

echo "=== 7. variant sweep (cull/presort/caps/chunk; time permitting) ==="
timeout 3600 python tools/bench_variants.py --skip-probe 2>&1 | tee "$LOG/bench_variants.log"

echo "=== done; logs in $LOG ==="
