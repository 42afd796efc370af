#!/bin/sh
# Packaging smoke: imports-only, NOT behavioral (reference analog:
# docker/jobs/local_smoke.sh:1-13). Verifies the installed package's lanes
# import and the CLIs parse --help.
set -e
python - <<'EOF'
import mermaid_classifier_tpu.inference  # inference lane (jax/numpy only)
import mermaid_classifier_tpu.train.runner  # training lane
import mermaid_classifier_tpu.parallel  # multi-chip lane
print("imports OK")
EOF
for script in classifier_train build_feature_bucket launch_processing \
              launch_training build_coralnet_manifest generate_report \
              generate_training_config release_artifact \
              extract_reference_features train_job_entrypoint \
              predict_features annotate_image sync_tracking; do
    python "scripts/${script}.py" --help > /dev/null
done
echo "smoke OK"
