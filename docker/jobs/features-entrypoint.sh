#!/bin/sh
# Extraction worker shim (reference analog: docker/jobs/features-entrypoint.sh).
set -e
exec python scripts/build_feature_bucket.py "$@"
