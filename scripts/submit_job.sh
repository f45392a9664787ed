#!/usr/bin/env bash
# Launch the dedup job the way the north rule prescribes:
#   spark-submit --py-files <engine zip> <job> <corpus> <cores>
# On a real cluster, replace --master local[N] with the cluster master
# and size --conf spark.sql.shuffle.partitions to 2-3x total cores.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORPUS="${1:-/tmp/pyjedai_scaling_corpus.parquet}"
CORES="${2:-32}"

ZIP="$(mktemp -d)/pyjedai_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" pyjedai_spark)

exec spark-submit \
  --master "local[$CORES]" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions=$((CORES * 2)) \
  --conf spark.driver.memory=48g \
  "$REPO/scripts/scaling_run.py" "$CORPUS" "$CORES"
