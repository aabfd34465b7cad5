#!/bin/bash
# Round-3 quality records at reference scale (199 pairs, the count the
# reference's eval_homography.py uses): one JSON per published README row
# lands in docs/quality_records/ (written by scripts/quality_eval.py).
# Run AFTER training finishes (TPU must be free). ~1.5 h total.
cd /root/repo || exit 1
LOG=${1:-/tmp/record_quality_r3.log}
P=${PAIRS:-199}
echo "record_quality_r3 starting $(date -u), pairs=$P" >> "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 7200 python scripts/quality_eval.py --pairs "$P" "$@" >> "$LOG" 2>&1
}

# fused speed path at the EXACT bench operating point (one config for
# both the BENCH number and this table): e2e joint weights when present
FW=weights/gims_tpu_dense_gray_e2e.npz
CW=weights/gims_tpu_dense_gray_e2e_car.npz
if [ ! -f "$FW" ]; then FW=weights/gims_tpu_dense_gray_ft800.npz; CW=""; fi
FUSED_ARGS=(--fused --descriptor_source dense_gray --upsample 0
            --max_keypoints 6144 --compact_to 4096 --weights "$FW")
[ -n "$CW" ] && [ -f "$CW" ] && FUSED_ARGS+=(--car_weights "$CW")
run "${FUSED_ARGS[@]}" --out_json output/q_fused_ref.json
run "${FUSED_ARGS[@]}" --agc 25 7 8 --sinkhorn_iterations 100 \
    --match_threshold 0.2 --out_json output/q_fused_tuned.json

# staged parity path (host SIFT detect + SIFT descriptors)
SW=weights/gims_tpu_sift_last.npz
run --weights "$SW" --out_json output/q_staged_ref.json
run --weights "$SW" --agc 25 7 8 --sinkhorn_iterations 100 \
    --match_threshold 0.2 --out_json output/q_staged_tuned.json

# staged middle ground: device DoG detection + host SIFT descriptors
run --weights "$SW" --detector device --max_keypoints 6144 \
    --out_json output/q_staged_devdet.json

echo "record_quality_r3 finished $(date -u)" >> "$LOG"
