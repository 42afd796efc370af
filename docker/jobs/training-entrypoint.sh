#!/bin/sh
# Dispatch shim (reference analog: docker/jobs/training-entrypoint.sh):
# CONTAINER_ENTRYPOINT_SCRIPT selects the driver; default is the staged
# train job entrypoint.
set -e
SCRIPT="${CONTAINER_ENTRYPOINT_SCRIPT:-scripts/train_job_entrypoint.py}"
exec python "$SCRIPT" "$@"
