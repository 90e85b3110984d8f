#!/bin/bash
# One-shot TPU window playbook: run when the axon tunnel comes up.
# Serializes every chip job (only ONE process may own the TPU) and logs to
# the given dir. Every stage is wrapped in `timeout` so a tunnel that dies
# mid-stage can't hang the window; later stages still get a chance (the
# backend sometimes recovers between processes). Stage order: correctness
# gates first (incl. the VMEM-table Mosaic gate — interpret mode does not
# model lane alignment / scalar-carry rules), then the candidate EXACT
# ladder bench (zero-truncation, VMEM classes), then the parity headline
# (also seeds .jax_cache with the exact executable the driver's BENCH_r03
# run needs), then train proof and diagnostics.
# Usage: bash tools/tpu_window.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_window}
mkdir -p "$LOG"

LADDER="256:256,3840:64,28672:16,32768:4"

echo "=== 1. VMEM-table crosscheck (new-kernel Mosaic + fidelity gate) ==="
timeout 1500 python tools/crosscheck_tpu.py --skip-probe --vmem \
  2>&1 | tee "$LOG/crosscheck_vmem.log"

echo "=== 2. base crosscheck (regression gate) ==="
timeout 1500 python tools/crosscheck_tpu.py --skip-probe 2>&1 | tee "$LOG/crosscheck.log"

echo "=== 3. EXACT ladder bench (zero truncation + VMEM classes) ==="
timeout 4800 python bench.py --skip-probe --tpg 2 \
  --size-classes "$LADDER" --vmem-classes 2 --skip-infer \
  2>&1 | tee "$LOG/bench_exact_vmem.log"

echo "=== 3b. EXACT ladder bench, all-DMA (vmem ablation) ==="
timeout 2400 python bench.py --skip-probe --tpg 2 \
  --size-classes "$LADDER" --skip-infer --repeats 2 \
  2>&1 | tee "$LOG/bench_exact_dma.log"

echo "=== 4. parity benchmark (headline + cache seed for BENCH_r03) ==="
timeout 4800 python bench.py --skip-probe 2>&1 | tee "$LOG/bench_parity.log"

echo "=== 5. batch-3 remat'd 512^2 train step (VERDICT r2 item 3a; ==="
echo "===    const-lifted module ~4x smaller than the HTTP-500 fails) ==="
timeout 4800 python tools/compile_train_512.py --platform axon --execute \
  --batch-size 3 --remat 2>&1 | tee "$LOG/compile_train_512_b3.log"

echo "=== 6. stage breakdown diag ==="
timeout 4800 python tools/tpu_diag.py --skip-probe \
  --stages bin2,raster2,blend,full,refiner --out "$LOG/diag" \
  2>&1 | tee "$LOG/diag.log"

echo "=== 7. vmem/ladder variant sweep (time permitting) ==="
timeout 3600 python tools/bench_variants.py --skip-probe 2>&1 | tee "$LOG/bench_variants.log"

echo "=== done; logs in $LOG ==="
