#!/bin/bash
# Throughput curve across core counts on the SAME input — diagnoses whether
# sub-0.8 local[8]->local[32] efficiency is an engine property or the single
# box's shared memory bandwidth saturating (a real 4N-executor cluster
# scales bandwidth with executors; one VM does not).
SCALE=${SCALE:-23}
ITERS=${ITERS:-5}
for N in 2 4 8 16 32; do
  L=$(cut -d' ' -f1 /proc/loadavg)
  echo "cores=$N pre-load=$L $(date +%T)"
  SCALING_N=$N SCALING_REPEATS=1 python - <<PY 2>/dev/null | grep '^{'
import json, subprocess, sys
sys.path.insert(0, "/root/repo/scripts")
import importlib.util
spec = importlib.util.spec_from_file_location("scaling", "/root/repo/scripts/scaling.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
print(json.dumps(m.run($N, $SCALE, $ITERS)))
PY
done
