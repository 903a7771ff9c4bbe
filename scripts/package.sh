#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission:
#   ./scripts/package.sh && spark-submit --py-files dist/dstlr_spark.zip jobs/build_kg.py ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/dstlr_spark.zip
(cd . && zip -qr dist/dstlr_spark.zip dstlr_spark -x '*__pycache__*')
echo "dist/dstlr_spark.zip:"
unzip -l dist/dstlr_spark.zip | tail -2
