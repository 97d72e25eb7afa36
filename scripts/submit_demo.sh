#!/bin/bash
# End-to-end proof of the north rule's deployment shape: package the
# library, run the job via spark-submit --py-files from a scratch
# directory (so imports MUST resolve from the zip, not the repo), print
# the one-line job JSON. On a real cluster only --master and executor
# flags change.
set -eu
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
cd "$REPO" && zip -qr "$WORK/llama_spark.zip" llama_spark -x '*__pycache__*'
cp "$REPO/scripts/run_pagerank_job.py" "$WORK/job.py"
cd "$WORK"
spark-submit --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-8}" \
  --conf spark.ui.enabled=false \
  --py-files llama_spark.zip job.py "${1:-/root/testdata/sf0.001}" "${2:-5}"
