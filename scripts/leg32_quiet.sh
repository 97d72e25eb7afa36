#!/bin/bash
# Hunt for one CLEAN local[32] leg at RMAT scale 23: launch only when
# loadavg < 0.8 (nothing external running), 15 iterations, record min.
# Compare offline against the clean local[8] min (7.54 s/iter, 2026-08-16).
for i in $(seq 1 10); do
  while :; do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" 'BEGIN{exit !(l<0.8)}' && break
    sleep 45
  done
  echo "leg32 attempt $i pre-load $(cut -d' ' -f1 /proc/loadavg) $(date +%T)"
  python - <<'PY' 2>/dev/null | grep '^{'
import importlib.util, json
spec = importlib.util.spec_from_file_location("scaling", "/root/repo/scripts/scaling.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
print(json.dumps(m.run(32, 23, 15)))
PY
  echo "post-load $(cut -d' ' -f1 /proc/loadavg)"
done
