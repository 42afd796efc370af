#!/usr/bin/env python
"""CLI for publishing an immutable classifier release
(reference analog: scripts/release_artifact.py:150-198).

Usage:
    python scripts/release_artifact.py --version v3 \
        --artifact models:/mermaid-mlp-prod \
        --bucket mermaid-config [--extra-file efficientnet_weights.npz]
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("release_artifact")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--version", required=True, help="vN, immutable")
    parser.add_argument(
        "--artifact",
        required=True,
        help="artifact dir, models:/<name>[/vN], or store://bucket/prefix",
    )
    parser.add_argument("--bucket", required=True)
    parser.add_argument("--extra-file", action="append", default=[])
    parser.add_argument("--tracker-root", default=None)
    parser.add_argument(
        "--fidelity-record", default=None,
        help="fidelity record JSON from scripts/diff_backbone.py --record;"
        " REQUIRED when --extra-file ships backbone weights (.npz) —"
        " docs/release_fidelity_runbook.md",
    )
    parser.add_argument(
        "--allow-unverified-backbone", action="store_true",
        help="downgrade the missing-fidelity-record refusal to a loud"
        " warning (emergencies only)",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")

    from mermaid_classifier_tpu.data.store import get_default_store
    from mermaid_classifier_tpu.serve.annotation import resolve_classifier_artifact
    from mermaid_classifier_tpu.serve.release import ReleaseError, release_artifact

    try:
        artifact_dir = resolve_classifier_artifact(
            args.artifact, tracker_root=args.tracker_root
        )
        written = release_artifact(
            get_default_store(),
            args.bucket,
            args.version,
            artifact_dir,
            extra_files=args.extra_file,
            fidelity_record=args.fidelity_record,
            allow_unverified_backbone=args.allow_unverified_backbone,
        )
    except (ReleaseError, FileNotFoundError) as exc:
        logger.error("%s", exc)
        return 1
    logger.info("release complete: %s", ", ".join(written))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
