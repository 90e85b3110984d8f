#!/bin/bash
# Round-5 TPU window A: grouped-frame probes + grouped bench.
# Serialized: ONE TPU job at a time (CLAUDE.md: concurrent axon jobs abort).
cd /root/repo
OUT=outputs/bench/tpu_window_r5a
mkdir -p $OUT
LADDER="173:256,892:100,1528:49,2868:30,3858:16,11177:9,128417:4"
# 1. grouped two-phase probe at priority_window=0 (the bedbf66 row-major
#    fast path was never measured post-commit; pw=16 reference number is
#    28.39 ms/frame, outputs/bench/tpu_window_r4c/ee_stages6_newladder.log)
timeout 2400 python tools/ee_probe.py --stages6 --cache --skip-counts --variants "" \
  --ladder "$LADDER" --priority-window 0 \
  > $OUT/ee_stages6_pw0.log 2>&1
tail -5 $OUT/ee_stages6_pw0.log
# 2. grouped full bench G=4 (prep+blend+refiner phase-split), new ladder
timeout 3000 python bench.py --group 4 --size-classes "$LADDER" \
  --skip-infer --probe-attempts 3 \
  > $OUT/bench_group4.log 2>&1
tail -3 $OUT/bench_group4.log
# 3. prep decomposition at both priority windows (VERDICT item 2: find
#    the ~21 ms; scene cache reused from job 1)
timeout 2400 python tools/ee_probe.py --stages7 --cache --skip-counts --variants "" \
  --ladder "$LADDER" --priority-window 16 \
  > $OUT/ee_stages7_pw16.log 2>&1
grep "\[ee\]" $OUT/ee_stages7_pw16.log | tail -8
timeout 2400 python tools/ee_probe.py --stages7 --cache --skip-counts --variants "" \
  --ladder "$LADDER" --priority-window 0 \
  > $OUT/ee_stages7_pw0.log 2>&1
grep "\[ee\]" $OUT/ee_stages7_pw0.log | tail -8
# 4. grouped bench + static envelope class order (the per-frame rank sort
#    leaves the frame loop; stats validate truncation over sample frames)
timeout 3000 python bench.py --group 4 --static-class-order \
  --skip-infer --probe-attempts 3 \
  > $OUT/bench_group4_staticorder.log 2>&1
tail -3 $OUT/bench_group4_staticorder.log
# 5. 3-phase grouped bench (blend and refine in separate loops too)
timeout 3000 python bench.py --group 4 --static-class-order --phases 3 \
  --skip-infer --probe-attempts 3 \
  > $OUT/bench_group4_p3.log 2>&1
tail -3 $OUT/bench_group4_p3.log
