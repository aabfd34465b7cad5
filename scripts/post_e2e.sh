#!/bin/bash
# After the watchdog-resumed fused-e2e training run exits, export its
# checkpoints to STAGING weight files and run the 50-pair quality eval
# on them — results land in /tmp/post_e2e.log for review. Does NOT touch
# the bench-preferred weights/gims_tpu_dense_gray_e2e.npz name: promotion
# is a human decision after reading the quality table.
cd /root/repo || exit 1
LOG=/tmp/post_e2e.log
echo "post_e2e starting $(date -u)" >> "$LOG"
# wait for the training process (pid file written by tpu_watch_resume.sh)
for i in $(seq 1 2000); do
  PID=$(cat /tmp/e2e_train.pid 2>/dev/null)
  if [ -n "$PID" ] && ! kill -0 "$PID" 2>/dev/null; then
    break
  fi
  sleep 60
done
RUN=$(ls -dt output/train/e2e_dense_gray* | head -1)
echo "training done; exporting from $RUN $(date -u)" >> "$LOG"
for ck in best last; do
  python scripts/export_checkpoint.py "$RUN/weights/$ck" \
    "weights/_staging_e2e_${ck}.npz" --e2e \
    --config configs/e2e_dense_gray_800.yaml >> "$LOG" 2>&1
done
for ck in best last; do
  echo "=== quality ${ck} ===" >> "$LOG"
  timeout 3600 python scripts/quality_eval.py \
    --weights "weights/_staging_e2e_${ck}.npz" \
    --car_weights "weights/_staging_e2e_${ck}_car.npz" \
    --fused --descriptor_source dense_gray --max_keypoints 12288 \
    >> "$LOG" 2>&1
done
echo "post_e2e finished $(date -u)" >> "$LOG"
