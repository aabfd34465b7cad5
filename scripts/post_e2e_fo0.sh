#!/bin/bash
# Round-3: after the e2e_fo0b fused-e2e training exits, export its
# best/last/minloss checkpoints to STAGING weights and run the 50-pair
# fused quality probe on each at the exact bench operating point
# (firstOctave=0, 6144 budget, compact 4096). Results in
# /tmp/post_e2e_fo0.log. Promotion to weights/gims_tpu_dense_gray_e2e.npz
# stays a human decision after reading the table.
cd /root/repo || exit 1
LOG=/tmp/post_e2e_fo0.log
RUN=output/train/e2e_fo0b
CFG=configs/e2e_fo0_800.yaml
echo "post_e2e_fo0 starting $(date -u)" >> "$LOG"
PID=$(cat /tmp/e2e_train.pid 2>/dev/null)
for i in $(seq 1 2000); do
  if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    break
  fi
  sleep 60
done
echo "training done; exporting from $RUN $(date -u)" >> "$LOG"
for ck in best last minloss; do
  [ -d "$RUN/weights/$ck" ] || continue
  python scripts/export_checkpoint.py "$RUN/weights/$ck" \
    "weights/_staging_fo0_${ck}.npz" --e2e --config "$CFG" >> "$LOG" 2>&1
done
for ck in best last minloss; do
  [ -f "weights/_staging_fo0_${ck}.npz" ] || continue
  echo "=== quality ${ck} (bench operating point) ===" >> "$LOG"
  timeout 3600 python scripts/quality_eval.py \
    --weights "weights/_staging_fo0_${ck}.npz" \
    --car_weights "weights/_staging_fo0_${ck}_car.npz" \
    --fused --descriptor_source dense_gray --upsample 0 \
    --max_keypoints 6144 --compact_to 4096 \
    --out_json "output/q_fo0_${ck}.json" >> "$LOG" 2>&1
done
echo "post_e2e_fo0 finished $(date -u)" >> "$LOG"
