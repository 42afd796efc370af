#!/usr/bin/env python
"""Launch a training job from a run YAML
(reference analog: scripts/launch_training.py:131-203).

Usage:
    python scripts/launch_training.py --run-config runs/train.yaml \
        [--run-id my-run] [--dry-run] [--log-dir logs/]
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("launch_training")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run-config", required=True)
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--log-dir", default=None)
    parser.add_argument(
        "--backend", choices=("local", "k8s"), default="local",
        help="local = subprocess workers on this host; k8s = one"
        " Kubernetes Job per worker via kubectl (requires a"
        " job.cluster: block in the run YAML)",
    )
    parser.add_argument(
        "--staging-bucket", default=None,
        help="stage the training config dir into the store under"
        " runs/<run-id>/config/ before submitting",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")

    from mermaid_classifier_tpu.jobs import (
        JobStatus,
        LocalProcessBackend,
        launch_training,
        parse_run_config,
        wait_for_completion,
    )

    config = parse_run_config(args.run_config, strict=True)
    run_id = args.run_id or f"train-{int(time.time())}"
    if args.staging_bucket:
        from mermaid_classifier_tpu.data.store import get_default_store
        from mermaid_classifier_tpu.jobs.launch import stage_config_dir

        config_dir = config.resolve_sibling(
            config.training.config_dir if config.training else "."
        )
        written = stage_config_dir(
            get_default_store(), args.staging_bucket, run_id, config_dir
        )
        logger.info("staged %d config files to %s", len(written),
                    args.staging_bucket)
    if args.backend == "k8s":
        from mermaid_classifier_tpu.jobs.kubernetes import (
            ClusterSpec,
            KubernetesJobBackend,
        )

        if config.job.cluster is None:
            raise SystemExit(
                "--backend k8s needs a job.cluster: block in the run YAML"
            )
        backend = KubernetesJobBackend(
            ClusterSpec(**config.job.cluster.model_dump())
        )
    else:
        backend = LocalProcessBackend(log_dir=args.log_dir)
    job_ids = launch_training(config, backend, run_id, dry_run=args.dry_run)
    if args.dry_run:
        return 0
    statuses = wait_for_completion(backend, job_ids)
    return 0 if all(s is JobStatus.COMPLETED for s in statuses.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
