#!/usr/bin/env bash
# north_rule deployment shape: spark-submit --py-files at two cluster
# sizes (local[N] / local[4N] as the sandbox proxy for N / 4N executors).
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-2}"
ROWS="${2:-20000}"
OUT="$(mktemp -d)/ds"
ZIP="$(mktemp -d)/colcrush.zip"
(cd . && zip -qr "$ZIP" colcrush)
for CORES in "$N" "$((4 * N))"; do
  rm -rf "$OUT"
  echo "== spark-submit local[$CORES] =="
  spark-submit --master "local[$CORES]" \
    --conf spark.sql.shuffle.partitions="$CORES" \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.driver.memory=16g \
    --py-files "$ZIP" \
    scripts/encode_job.py --input "SYNTH:$ROWS" --output "$OUT" 2>/dev/null | tail -1
done
