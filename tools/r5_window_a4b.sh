#!/bin/bash
# Round-5 window A4+B: validate the packed-rect + no-cull binning on-chip
# (bench defaults), then the training-evidence window (VERDICT items 4+5)
# and the non-raster diag (item 6). Health-gated per job; ONE TPU job at
# a time.
cd /root/repo
OUT=outputs/bench/tpu_window_r5a
OUTB=outputs/bench/tpu_window_r5b
mkdir -p $OUT $OUTB outputs/training/teacher512
gate() { python tools/tpu_health.py --wait --max-wait 7200 || exit 1; }

gate
# A4.1 bench at the new defaults (group 4, tile_cull off, packed-rect
# gather): the driver-comparable headline
timeout 3000 python bench.py --skip-infer --probe-attempts 3 \
  > $OUT/bench_nocull_packrect.log 2>&1
tail -1 $OUT/bench_nocull_packrect.log

# B.1 teacher512 dataset (rebuild: /tmp wiped between rounds)
if [ ! -f /tmp/guava_teacher512_ds/img_store.grv ]; then
  gate
  timeout 3000 python tools/make_teacher_dataset.py \
    --out /tmp/guava_teacher512_ds \
    -c configs/train/teacher512_synthetic.yaml --videos 2 --frames 16 \
    > $OUTB/teacher512_dataset.log 2>&1
  tail -3 $OUTB/teacher512_dataset.log
fi

# B.2 teacher512 300-iter on-chip run (remat verification; last committed
# outcome for this config was RESOURCE_EXHAUSTED)
gate
timeout 7200 python main/train.py -c configs/train/teacher512_synthetic.yaml \
  --synthetic_assets --platform axon \
  > $OUTB/train512_run.log 2>&1
RC=$?
echo "train512 rc=$RC"
tail -5 $OUTB/train512_run.log
cp -f outputs/training/teacher512/train_log.txt $OUTB/train512_train_log.txt 2>/dev/null

# B.3 full-dims (DINOv2-B/768) compile + one executed step
gate
timeout 3600 python tools/compile_train_512.py --accum --remat --execute \
  > $OUTB/compile_train_512_full.log 2>&1
tail -5 $OUTB/compile_train_512_full.log

# B.4 fresh non-raster frame-parts diag
gate
timeout 3600 python tools/tpu_diag.py --stages deform,refiner,frame_parts \
  --size-classes "173:256,892:100,1528:49,2868:30,3858:16,11177:9,128417:4" \
  --out $OUTB > $OUTB/diag_parts.log 2>&1
tail -12 $OUTB/diag_parts.log
echo "WINDOW A4B DONE"
