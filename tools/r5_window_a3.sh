#!/bin/bash
# Round-5 window A3: the bench jobs that failed when the tunnel dropped
# mid-window-A2, now health-gated per job (tools/tpu_health.py --wait).
cd /root/repo
OUT=outputs/bench/tpu_window_r5a
mkdir -p $OUT
LADDER="173:256,892:100,1528:49,2868:30,3858:16,11177:9,128417:4"
gate() { python tools/tpu_health.py --wait --max-wait 7200 || exit 1; }

gate
# 1. grouped full bench G=4 (now the bench.py default config)
timeout 3000 python bench.py --skip-infer --probe-attempts 3 \
  > $OUT/bench_group4.log 2>&1
tail -1 $OUT/bench_group4.log

gate
# 2. grouped bench + static envelope class order
timeout 3000 python bench.py --static-class-order \
  --skip-infer --probe-attempts 3 \
  > $OUT/bench_group4_staticorder.log 2>&1
tail -1 $OUT/bench_group4_staticorder.log

gate
# 3. 3-phase grouped bench (blend and refine in separate loops too)
timeout 3000 python bench.py --static-class-order --phases 3 \
  --skip-infer --probe-attempts 3 \
  > $OUT/bench_group4_p3.log 2>&1
tail -1 $OUT/bench_group4_p3.log

gate
# 4. duplication layout probe (stages7 follow-up: 12.8 ms duplicate +
#    5.0 ms gathers; (cap,n) sublane layout + no-cull + packed-rect-gather
#    hypotheses). pw=0 (row-major fast path): with the zero-truncation
#    envelope ladder the kept instance set is identical to pw=16.
timeout 3600 python tools/dup_probe.py --with-sort --priority-window 0 \
  --variants base,tpose,slotm,base+nocull,tpose+nocull,tpose+nocull+packrect \
  > $OUT/dup_probe_pw0.log 2>&1
grep "\[dup\]" $OUT/dup_probe_pw0.log

gate
timeout 2400 python tools/dup_probe.py --with-sort --priority-window 16 \
  --variants base,tpose,tpose+nocull \
  > $OUT/dup_probe_pw16.log 2>&1
grep "\[dup\]" $OUT/dup_probe_pw16.log
echo "WINDOW A3 DONE"
