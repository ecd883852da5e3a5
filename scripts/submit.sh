#!/usr/bin/env bash
# Package anno_spark and run the pipeline via spark-submit --py-files.
#   scripts/submit.sh <pages-path|synth:N> <output-dir> [extra run_pipeline args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PAGES="${1:?pages path or synth:N}"
OUT="${2:?output dir}"
shift 2

ZIP="$(mktemp -d)/anno_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" anno_spark -x '*/__pycache__/*')

MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --py-files "$ZIP" \
  "$REPO/scripts/run_pipeline.py" --pages "$PAGES" --output "$OUT" "$@"
