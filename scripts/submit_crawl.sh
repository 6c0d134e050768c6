#!/usr/bin/env bash
# Package warcio_spark and launch the crawl via spark-submit --py-files —
# the north rule's deployment shape (BASELINE.json: "launched with
# spark-submit --py-files on multi-executor clusters").
#
# Usage:
#   scripts/submit_crawl.sh [--master spark://... ] --state /path/state \
#       [--seeds 100000] [--rounds 5] [extra spark-submit args...]
#
# Locally (no cluster) this runs on local[*]; on a cluster pass --master
# and executor sizing, e.g.:
#   scripts/submit_crawl.sh --master yarn --num-executors 250 \
#       --executor-cores 4 --executor-memory 8g --state hdfs:///crawl/state
# Run the same job at N and 4N executors to measure scaling efficiency.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
BUILD="${REPO}/build"
mkdir -p "${BUILD}"
ZIP="${BUILD}/warcio_spark.zip"

(cd "${REPO}" && rm -f "${ZIP}" && zip -qr "${ZIP}" warcio_spark -x '*__pycache__*')
echo "packaged: ${ZIP}"

exec spark-submit \
  --py-files "${ZIP}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.optimizer.runtime.bloomFilter.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "${REPO}/scripts/crawl_job.py" "$@"
