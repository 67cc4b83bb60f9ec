#!/usr/bin/env bash
# North-rule launch mode: spark-submit --py-files kg_pipeline.zip.
# Usage: scripts/submit_ingest.sh [master] [n_pages] [extra ingest_job args...]
set -euo pipefail
cd "$(dirname "$0")/.."
MASTER="${1:-local[32]}"; shift || true
N_PAGES="${1:-20000}"; shift || true
ZIP="$(mktemp -d)/kg_pipeline.zip"
zip -qr "$ZIP" neo4j_document_pipeline_spark
exec spark-submit --master "$MASTER" --py-files "$ZIP" \
    scripts/ingest_job.py --master "$MASTER" --n-pages "$N_PAGES" "$@"
