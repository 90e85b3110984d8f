#!/bin/bash
# Background tunnel watcher: poll the axon backend every few minutes; the
# moment it answers, run the full tpu_window.sh playbook (crosscheck +
# parity bench + variant sweep) and COMMIT the logs so on-chip evidence is
# persisted even if the tunnel drops again (VERDICT round-2 item 1).
#
#   bash tools/tpu_watcher.sh [max_seconds] [poll_interval_seconds]
#
# Exits 0 after one successful committed window; exits 1 on timeout.
set -u
cd "$(dirname "$0")/.."
MAX_S=${1:-37800}      # 10.5 h default
POLL_S=${2:-240}
START=$(date +%s)
STAMP=$(date +%Y%m%d_%H%M%S)
STATE=/tmp/tpu_watcher_${STAMP}.log

echo "[watcher] started $(date -u) max=${MAX_S}s poll=${POLL_S}s" | tee -a "$STATE"

while :; do
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$MAX_S" ]; then
    echo "[watcher] gave up after ${MAX_S}s; tunnel never came up" | tee -a "$STATE"
    exit 1
  fi
  OUT=$(timeout 110 python -c "
from guava_renderer_tpu.utils.platform import probe_backend
ok, detail = probe_backend('axon', timeout_s=90)
print('OK' if ok else f'DOWN {detail}')
" 2>&1)
  echo "[watcher] $(date -u +%H:%M:%S) probe: $OUT" | tee -a "$STATE"
  if [[ "$OUT" == *OK* ]]; then
    break
  fi
  sleep "$POLL_S"
done

WSTAMP=$(date +%Y%m%d_%H%M%S)
LOGDIR="outputs/bench/tpu_window_${WSTAMP}"
echo "[watcher] TUNNEL UP — running window playbook into $LOGDIR" | tee -a "$STATE"
bash tools/tpu_window.sh "$LOGDIR" 2>&1 | tee -a "$STATE"

# Commit the evidence (retry around possible index-lock contention with the
# interactive session).
for i in 1 2 3 4 5; do
  if git add "$LOGDIR" && \
     git commit -m "TPU window: on-chip crosscheck + parity bench + variant sweep logs" \
       -- "$LOGDIR"; then
    echo "[watcher] committed $LOGDIR" | tee -a "$STATE"
    exit 0
  fi
  echo "[watcher] git commit attempt $i failed; retrying in 30s" | tee -a "$STATE"
  sleep 30
done
echo "[watcher] WARNING: logs in $LOGDIR but commit failed" | tee -a "$STATE"
exit 0
