#!/bin/bash
# Round-5 TPU window A (trimmed): prep decomposition first, then grouped
# bench variants. Serialized: ONE TPU job at a time (CLAUDE.md).
cd /root/repo
OUT=outputs/bench/tpu_window_r5a
mkdir -p $OUT
LADDER="173:256,892:100,1528:49,2868:30,3858:16,11177:9,128417:4"
# 1. prep decomposition (where do the ~23 ms of prep go?)
timeout 2400 python tools/ee_probe.py --stages7 --cache --skip-counts --variants "" \
  --ladder "$LADDER" --priority-window 16 \
  > $OUT/ee_stages7_pw16.log 2>&1
grep "\[ee\]" $OUT/ee_stages7_pw16.log | tail -10
# 2. grouped full bench G=4 (prep+blend+refiner phase-split), new ladder
timeout 3000 python bench.py --group 4 --size-classes "$LADDER" \
  --skip-infer --probe-attempts 3 \
  > $OUT/bench_group4.log 2>&1
tail -3 $OUT/bench_group4.log
# 3. grouped bench + static envelope class order
timeout 3000 python bench.py --group 4 --static-class-order \
  --skip-infer --probe-attempts 3 \
  > $OUT/bench_group4_staticorder.log 2>&1
tail -3 $OUT/bench_group4_staticorder.log
# 4. 3-phase grouped bench (blend and refine in separate loops too)
timeout 3000 python bench.py --group 4 --static-class-order --phases 3 \
  --skip-infer --probe-attempts 3 \
  > $OUT/bench_group4_p3.log 2>&1
tail -3 $OUT/bench_group4_p3.log
echo "WINDOW A2 DONE"
