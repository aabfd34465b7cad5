#!/bin/bash
# Round-4: after the e2e_band fine-tune (band AGC inside the training
# program, configs/e2e_band_800.yaml) exits, export its
# best/last/minloss checkpoints to STAGING weights and run the 50-pair
# fused quality probe on each at the EXACT shipped default
# (FusedMatching TPU auto-resolution: band AGC hw=512, approx strided
# threshold, centroid reconnect, auto compact 3072, fmo=0). Results in
# /tmp/post_e2e_band.log; promotion via
#   python scripts/promote_e2e.py --prefix band --precision_weight 0.3
# stays a separate decision after reading the table.
cd /root/repo || exit 1
LOG=/tmp/post_e2e_band.log
# canonical run dir first; fall back to the newest versioned sibling
# only when the canonical dir has no checkpoints (ADVICE r4: newest
# mtime can select a stale pre-fix fork over the in-place run)
RUN=""
if [ -d output/train/e2e_band/weights/last ]; then
  RUN=output/train/e2e_band
else
  RUN=$(ls -dt output/train/e2e_band* 2>/dev/null | head -1)
fi
if [ -z "$RUN" ]; then
  echo "no e2e_band run dir found; aborting" >> /tmp/post_e2e_band.log
  exit 1
fi
CFG=configs/e2e_band_800.yaml
echo "post_e2e_band starting $(date -u)" >> "$LOG"
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
    "weights/_staging_band_${ck}.npz" --e2e --config "$CFG" >> "$LOG" 2>&1
done
for ck in best last minloss; do
  [ -f "weights/_staging_band_${ck}.npz" ] || continue
  echo "=== quality ${ck} (shipped fused default) ===" >> "$LOG"
  timeout 3600 python scripts/quality_eval.py \
    --weights "weights/_staging_band_${ck}.npz" \
    --car_weights "weights/_staging_band_${ck}_car.npz" \
    --fused --descriptor_source dense_gray --upsample 0 \
    --max_keypoints 6144 \
    --out_json "output/q_band_${ck}.json" >> "$LOG" 2>&1
done
echo "post_e2e_band finished $(date -u)" >> "$LOG"
