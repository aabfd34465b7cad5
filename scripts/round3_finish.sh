#!/bin/bash
# Round-3 finish chain, resilient to session interruption. Waits for the
# post-training probe script (scripts/post_e2e_fo0.sh) to finish, then:
#   1. promotes the best e2e staging checkpoint (scripts/promote_e2e.py)
#   2. runs the headline bench at the default knobs
#   3. records the 199-pair quality tables (scripts/record_quality_r3.sh)
# Everything logs to /tmp/round3_finish.log.
cd /root/repo || exit 1
LOG=/tmp/round3_finish.log
echo "round3_finish starting $(date -u)" >> "$LOG"

PID=$(cat /tmp/post_fo0.pid 2>/dev/null)
for i in $(seq 1 2000); do
  if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    break
  fi
  sleep 60
done
echo "post probes done $(date -u); promoting" >> "$LOG"
python scripts/promote_e2e.py >> "$LOG" 2>&1

echo "=== bench (default knobs) $(date -u) ===" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1

echo "=== 199-pair records $(date -u) ===" >> "$LOG"
bash scripts/record_quality_r3.sh "$LOG"
echo "round3_finish finished $(date -u)" >> "$LOG"
