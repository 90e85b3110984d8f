#!/bin/bash
# Round-5 TPU window C: validate + rebench the round-5 raster changes.
# Health-gated per job; ONE TPU job at a time (CLAUDE.md).
cd /root/repo
OUT=outputs/bench/tpu_window_r5c
mkdir -p $OUT
gate() { python tools/tpu_health.py --wait --max-wait 7200 || exit 1; }

gate
# 1. Mosaic gate: bf16-row blend fwd+bwd compile at bench shapes
timeout 1800 python tools/aot_gate_bf16.py > $OUT/aot_gate_bf16.log 2>&1
tail -3 $OUT/aot_gate_bf16.log

gate
# 2. headline: bench defaults (grouped G=4, no-cull, packed-rect bin)
timeout 3000 python bench.py --skip-infer --probe-attempts 3 \
  > $OUT/bench_default.log 2>&1
tail -1 $OUT/bench_default.log

gate
# 3. bench + bf16 rows (if the gate passed)
if grep -q "GATE OK" $OUT/aot_gate_bf16.log; then
  timeout 3000 python bench.py --bf16-rows --skip-infer --probe-attempts 3 \
    > $OUT/bench_bf16rows.log 2>&1
  tail -1 $OUT/bench_bf16rows.log
fi

gate
# 4. grouped-glue probe: fori+DUS vs vmapped prep vs phase-only loops
timeout 3600 python tools/group_probe.py > $OUT/group_probe.log 2>&1
grep "\[grp\]" $OUT/group_probe.log

gate
# 5. duplication follow-up: slot-major + packed-rect at no-cull
timeout 2400 python tools/dup_probe.py --with-sort --priority-window 0 \
  --variants tpose+nocull+packrect,slotm+nocull+packrect \
  > $OUT/dup_probe_slotm.log 2>&1
grep "\[dup\]" $OUT/dup_probe_slotm.log

gate
# 6. fidelity gate at the new production config (tile_cull off is
#    bit-exact by construction; keep the evidence current)
timeout 3600 python tools/crosscheck_tpu.py --full-scale \
  > $OUT/fullscale_gate.log 2>&1
tail -4 $OUT/fullscale_gate.log
echo "WINDOW C DONE"
