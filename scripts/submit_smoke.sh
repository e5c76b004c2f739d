#!/usr/bin/env bash
# Launch-path evidence for the north rule: package the engine as a zip and
# run a real crawl through `spark-submit --py-files engine.zip` from a
# directory that does NOT contain the package, so the import can only be
# satisfied by the shipped zip (what a multi-executor cluster submit does).
#
#   scripts/submit_smoke.sh [master]     # default local[4]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[4]}"
WORK="$(mktemp -d /tmp/submit_smoke.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

(cd "$REPO" && zip -qr "$WORK/engine.zip" webcrawler_spark -x '*__pycache__*')
cp "$REPO/scripts/submit_main.py" "$WORK/"

cd "$WORK"
# Clear PYTHONPATH so the repo checkout cannot leak into the workers or
# driver — the zip is the only source of the package.
PYTHONPATH= spark-submit \
    --master "$MASTER" \
    --conf spark.sql.shuffle.partitions=8 \
    --py-files "$WORK/engine.zip" \
    "$WORK/submit_main.py" "$WORK/out"
