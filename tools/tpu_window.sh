#!/bin/bash
# One-shot TPU window playbook: run when the axon tunnel comes up.
# Serializes every chip job (only ONE process may own the TPU) and logs to
# the given dir. Every stage is wrapped in `timeout` so a tunnel that dies
# mid-stage can't hang the window; later stages still get a chance (the
# backend sometimes recovers between processes). Stage order: correctness
# gate first, then the HEADLINE BENCH (also seeds .jax_cache with the exact
# executable the driver's BENCH_r03 run needs — windows are short and the
# cache is what makes the driver-time compile a hit), then the diagnostics
# that drive the next optimization, then train proof and the sweep.
# Usage: bash tools/tpu_window.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_window}
mkdir -p "$LOG"

echo "=== 1. compiled-vs-interpret-vs-golden crosscheck (cull gate) ==="
timeout 1500 python tools/crosscheck_tpu.py --skip-probe 2>&1 | tee "$LOG/crosscheck.log"

echo "=== 2. parity benchmark (headline + cache seed for BENCH_r03) ==="
timeout 4800 python bench.py --skip-probe 2>&1 | tee "$LOG/bench_parity.log"

echo "=== 3. truncation quality A/B + stage breakdown ==="
timeout 4800 python tools/tpu_diag.py --skip-probe \
  --stages quality512,bin2,raster2,blend,full,refiner --out "$LOG/diag" \
  2>&1 | tee "$LOG/diag.log"

echo "=== 3b. row-gather DMA variants (bf16 rows / paired rows) ==="
timeout 1800 python tools/dma_bench.py --skip-probe 2>&1 | tee "$LOG/dma_bench.log"

echo "=== 4. batch-3 remat'd 512^2 train step (VERDICT r2 item 3a) ==="
timeout 4800 python tools/compile_train_512.py --platform axon --execute \
  --batch-size 3 --remat 2>&1 | tee "$LOG/compile_train_512_b3.log"

echo "=== 5. variant sweep (cull/presort/caps/chunk) ==="
timeout 3600 python tools/bench_variants.py --skip-probe 2>&1 | tee "$LOG/bench_variants.log"

echo "=== done; logs in $LOG ==="
