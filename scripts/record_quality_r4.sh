#!/bin/bash
# Round-4 quality records at reference scale (199 pairs): re-capture the
# FUSED rows with the band-AGC fine-tuned weights (configs/e2e_band_800.yaml
# trained through the exact shipped serving graph build) after
# scripts/promote_e2e.py --prefix band promotes a staging checkpoint to
# weights/gims_tpu_dense_gray_e2e.npz. The staged rows (host SIFT /
# device-detector) are weight-unchanged from round 3 and keep their
# records. Run AFTER training finishes (TPU must be free). ~30 min.
cd /root/repo || exit 1
LOG=${1:-/tmp/record_quality_r4.log}
P=${PAIRS:-199}
echo "record_quality_r4 starting $(date -u), pairs=$P" >> "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 7200 python scripts/quality_eval.py --pairs "$P" "$@" >> "$LOG" 2>&1
}

FW=weights/gims_tpu_dense_gray_e2e.npz
CW=weights/gims_tpu_dense_gray_e2e_car.npz
FUSED_ARGS=(--fused --descriptor_source dense_gray --upsample 0
            --max_keypoints 6144 --weights "$FW" --car_weights "$CW")
# the EXACT bench operating point (FusedMatching TPU auto-resolution:
# band AGC hw=512, approx strided threshold, centroid reconnect,
# auto compact) — one config for BENCH_r04 and this table
run "${FUSED_ARGS[@]}" --out_json output/q_fused_ref_r4.json
# tuned-knob row (same program shape, eval knobs turned)
run "${FUSED_ARGS[@]}" --agc 25 7 8 --sinkhorn_iterations 100 \
    --match_threshold 0.2 --out_json output/q_fused_tuned_r4.json

echo "record_quality_r4 finished $(date -u)" >> "$LOG"
