#!/bin/bash
# Round-5 TPU window B2: training evidence (VERDICT items 4+5) + fresh
# non-raster diag (item 6), health-gated per job. Serialized: one TPU job
# at a time (CLAUDE.md).
cd /root/repo
OUT=outputs/bench/tpu_window_r5b
mkdir -p $OUT outputs/training/teacher512
gate() { python tools/tpu_health.py --wait --max-wait 7200 || exit 1; }

# 1. teacher512 dataset (rebuild: /tmp was wiped between rounds)
if [ ! -f /tmp/guava_teacher512_ds/img_store.grv ]; then
  gate
  timeout 3000 python tools/make_teacher_dataset.py \
    --out /tmp/guava_teacher512_ds \
    -c configs/train/teacher512_synthetic.yaml --videos 2 --frames 16 \
    > $OUT/teacher512_dataset.log 2>&1
  tail -3 $OUT/teacher512_dataset.log
fi

# 2. teacher512 300-iter on-chip run (remat fix 36284e8 verification:
#    the config's last committed outcome was RESOURCE_EXHAUSTED)
gate
timeout 7200 python main/train.py -c configs/train/teacher512_synthetic.yaml \
  --synthetic_assets --platform axon \
  > $OUT/train512_run.log 2>&1
RC=$?
echo "train512 rc=$RC"
tail -5 $OUT/train512_run.log

# 3. full-dims (DINOv2-B/768) compile + one executed step (item 5)
gate
timeout 3600 python tools/compile_train_512.py --accum --remat --execute \
  > $OUT/compile_train_512_full.log 2>&1
tail -5 $OUT/compile_train_512_full.log

# 4. fresh non-raster frame-parts diag (item 6)
gate
timeout 3600 python tools/tpu_diag.py --stages deform,refiner,frame_parts \
  --size-classes "173:256,892:100,1528:49,2868:30,3858:16,11177:9,128417:4" \
  --out $OUT > $OUT/diag_parts.log 2>&1
tail -12 $OUT/diag_parts.log
echo "WINDOW B2 DONE"
