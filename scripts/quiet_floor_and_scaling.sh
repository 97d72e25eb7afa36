#!/bin/bash
# Wait for a quiet window (external tenant load < 1.0), then measure:
#  1. same-window 8-vs-32 legs at RMAT scale 23 (the north-rule N->4N proxy;
#     8-leg FIRST — it is the less contention-sensitive one, and the 32-leg
#     then runs in the freshest part of the window)
#  2. the per-iteration floor at RMAT scale 21, local[32]
# Prints one JSON line per leg; loadavg recorded before/after each leg.
cd "$(dirname "$0")/.." || exit 1
for attempt in $(seq 1 "${QF_ATTEMPTS:-60}"); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  if awk -v l="$L" 'BEGIN{exit !(l<1.0)}'; then
    echo "quiet window at $(date +%T) pre-load $L (attempt $attempt)"
    IFS='|' read -ra LEGS <<< "${QF_LEGS:-8 23 6|32 23 8|32 21 10}"
    for leg in "${LEGS[@]}"; do
      set -- $leg
      echo "LEG cores=$1 scale=$2 iters=$3 pre-load $(cut -d' ' -f1 /proc/loadavg)"
      python - "$1" "$2" "$3" <<'PY' 2>/dev/null | grep '^{'
import importlib.util, json, sys
spec = importlib.util.spec_from_file_location("scaling", "scripts/scaling.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
r = m.run(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
print(json.dumps({"cores": r["cores"], "edges": r["edges"],
                  "min": round(r["min_iter_sec"], 3),
                  "iters": [round(x, 2) for x in r["iter_secs"]],
                  "wall": round(r["wall_sec"], 1)}))
PY
      echo "post-load $(cut -d' ' -f1 /proc/loadavg)"
    done
    exit 0
  fi
  sleep 45
done
echo "no quiet window in ${QF_ATTEMPTS:-60} attempts"
exit 2
