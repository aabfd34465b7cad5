#!/bin/bash
# Watch for the axon TPU backend to come back, then resume the
# interrupted fused-e2e training run (output/train/e2e_dense_gray2,
# died at epoch 1 iter 399 in the 2026-08-17 tunnel outage).
#
# Bounded: at most MAX_PROBES probes 5 min apart (~12 h), then exits.
# Writes status to /tmp/e2e_resume.log; the training process's own log
# goes to /tmp/e2e_resume_train.log; its PID to /tmp/e2e_train.pid.
cd /root/repo || exit 1
MAX_PROBES=${MAX_PROBES:-150}
for i in $(seq 1 "$MAX_PROBES"); do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" >/dev/null 2>&1; then
    echo "TPU up after $i probes at $(date -u)" >> /tmp/e2e_resume.log
    nohup python train.py --config_path configs/e2e_dense_gray_800.yaml \
      --name e2e_dense_gray --limit 500 --photo_dir assets/photos \
      --fused_e2e \
      --restore_path output/train/e2e_dense_gray2/weights/last \
      > /tmp/e2e_resume_train.log 2>&1 &
    echo $! > /tmp/e2e_train.pid
    exit 0
  fi
  echo "probe $i down at $(date -u)" >> /tmp/e2e_resume.log
  sleep 210
done
echo "gave up after $MAX_PROBES probes at $(date -u)" >> /tmp/e2e_resume.log
exit 1
