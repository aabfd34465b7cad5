#!/bin/bash
# Round-4: watch for the axon TPU backend to come back after a tunnel
# outage, then kill the hung e2e_band training process (blocked on a
# device RPC futex) and resume it from output/train/e2e_band/weights/last.
# Bounded: MAX_PROBES probes 3 min apart. Status -> /tmp/e2e_resume.log,
# training log -> /tmp/e2e_band_train.log (append), new PID ->
# /tmp/e2e_train.pid.
cd /root/repo || exit 1
MAX_PROBES=${MAX_PROBES:-60}
for i in $(seq 1 "$MAX_PROBES"); do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" >/dev/null 2>&1; then
    echo "TPU up after $i probes at $(date -u)" >> /tmp/e2e_resume.log
    OLD=$(cat /tmp/e2e_train.pid 2>/dev/null)
    if [ -n "$OLD" ] && kill -0 "$OLD" 2>/dev/null; then
      # Only kill a process that (a) is actually the training run — the
      # pidfile may be stale and the PID reused — and (b) is actually
      # hung: its log mtime stalled > 5 min (ADVICE r4: the first probe
      # can succeed while training is healthy; killing it loses progress
      # since the last checkpoint).
      if ! grep -qs "train.py" "/proc/$OLD/cmdline"; then
        echo "pid $OLD is not train.py (stale pidfile); not killing" \
          >> /tmp/e2e_resume.log
        exit 0
      fi
      LOG_AGE=$(( $(date +%s) - $(stat -c %Y /tmp/e2e_band_train.log 2>/dev/null || echo 0) ))
      if [ "$LOG_AGE" -lt 300 ]; then
        echo "pid $OLD alive and logging (${LOG_AGE}s ago); not killing" \
          >> /tmp/e2e_resume.log
        exit 0
      fi
      kill "$OLD" 2>/dev/null
      sleep 5
      kill -9 "$OLD" 2>/dev/null
    fi
    nohup python train.py --config_path configs/e2e_band_800.yaml \
      --name e2e_band --limit 500 --photo_dir assets/photos \
      --fused_e2e \
      --restore_path output/train/e2e_band/weights/last \
      >> /tmp/e2e_band_train.log 2>&1 &
    echo $! > /tmp/e2e_train.pid
    echo "resumed as $(cat /tmp/e2e_train.pid) at $(date -u)" >> /tmp/e2e_resume.log
    exit 0
  fi
  echo "probe $i down at $(date -u)" >> /tmp/e2e_resume.log
  sleep 180
done
echo "gave up after $MAX_PROBES probes at $(date -u)" >> /tmp/e2e_resume.log
exit 1
