#!/bin/bash
# One-shot TPU window playbook: run when the axon tunnel comes up.
# Serializes every chip job (only ONE process may own the TPU) and logs to
# the given dir. Every stage is wrapped in `timeout` so a tunnel that dies
# mid-stage can't hang the window; later stages still get a chance (the
# backend sometimes recovers between processes). Stages are ordered by
# marginal value: correctness gate, then the per-stage perf breakdown that
# drives optimization, then the headline number, then train-step proof,
# then the variant sweep.
# Usage: bash tools/tpu_window.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_window}
mkdir -p "$LOG"

echo "=== 1. compiled-vs-interpret-vs-golden crosscheck ==="
timeout 1500 python tools/crosscheck_tpu.py --skip-probe 2>&1 | tee "$LOG/crosscheck.log"

echo "=== 2. per-stage perf breakdown (project/bin/blend/raster/refiner) ==="
timeout 4800 python tools/tpu_diag.py --skip-probe \
  --stages project,bin,blend,raster1,refiner,full --out "$LOG/diag" \
  2>&1 | tee "$LOG/diag.log"

echo "=== 2b. pipelined row-gather DMA bench ==="
timeout 1800 python tools/dma_bench.py \
  --variants rows_pipe:1,contig_pipe:1 2>&1 | tee "$LOG/dma_bench.log"

echo "=== 3. parity benchmark (the BENCH number) ==="
timeout 4800 python bench.py --skip-probe 2>&1 | tee "$LOG/bench_parity.log"

echo "=== 4. full-size train-step compile + one step (VMEM proof) ==="
timeout 4800 python tools/compile_train_512.py --platform axon --execute \
  2>&1 | tee "$LOG/compile_train_512.log"

echo "=== 5. variant sweep (tile/chunk/bf16) ==="
timeout 3600 python tools/bench_variants.py --skip-probe 2>&1 | tee "$LOG/bench_variants.log"

echo "=== done; logs in $LOG ==="
