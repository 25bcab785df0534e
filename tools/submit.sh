#!/usr/bin/env bash
# spark-submit packaging for the ER pipeline (north_rule deployment shape).
#
#   tools/submit.sh <fixture_or_corpus_dir> <run_dir> [extra spark-submit args]
#
# Builds refined_spark.zip and submits tools/run_job.py with --py-files.
# On a real cluster swap --master local[*] for yarn/k8s and size
# spark.sql.shuffle.partitions to ~2-3x total cores.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORPUS="${1:?corpus dir}"
RUN_DIR="${2:?run dir}"
shift 2 || true

ZIP="$REPO/build/refined_spark.zip"
mkdir -p "$REPO/build"
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" refined_spark \
    -x 'refined_spark/__pycache__/*' -x '*/__pycache__/*')

exec spark-submit \
  --master "${SPARK_MASTER:-local[32]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-32}" \
  --py-files "$ZIP" \
  "$@" \
  "$REPO/tools/run_job.py" "$CORPUS" "$RUN_DIR" ${JOB_FLAGS:-}
