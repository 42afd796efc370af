#!/usr/bin/env python
"""Classify extracted feature files in bulk and write a predictions CSV
(CLI over serve.batch_predict; fills the gap between the single-image
annotation viewer and the full training runner — production extraction
leaves buckets of *.features.npz behind, and this classifies them
through the one shipped artifact contract).

Usage:
    python scripts/predict_features.py \
        --classifier models:/mermaid-mlp-prod \
        --output predictions.csv [--top-n 3] \
        features/i001.features.npz features/i002.features.npz ...
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("predict_features")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--classifier", required=True,
                        help="artifact dir, models:/<name>[/vN], or"
                        " store://bucket/prefix")
    parser.add_argument("--output", required=True, help="predictions CSV path")
    parser.add_argument("--top-n", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--tracking-root", default=None,
                        help="tracker root for models:/ specs")
    parser.add_argument("--mesh-devices", type=int, default=None,
                        help="shard the head batch over an N-device mesh"
                        " (default: single device)")
    parser.add_argument("feature_files", nargs="+",
                        help="*.features.npz (rowcols+features) or bare"
                        " (P, D) *.npy matrices")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")

    from mermaid_classifier_tpu.inference.loader import load_predictor
    from mermaid_classifier_tpu.serve.annotation import (
        resolve_classifier_artifact,
    )
    from mermaid_classifier_tpu.serve.batch_predict import (
        predict_feature_files,
        write_predictions_csv,
    )

    artifact = resolve_classifier_artifact(
        args.classifier, tracker_root=args.tracking_root
    )
    if args.mesh_devices:
        from mermaid_classifier_tpu.parallel.mesh import make_mesh
        from mermaid_classifier_tpu.parallel.sharded_serve import (
            load_sharded_predictor,
        )

        mesh = make_mesh(args.mesh_devices)
        predictor = load_sharded_predictor(artifact, mesh)
        logger.info("serving over a %d-device mesh", args.mesh_devices)
    else:
        predictor = load_predictor(artifact)
    logger.info(
        "classifier %s: %d classes, input_dim %d",
        artifact, len(predictor.classes), predictor.input_dim,
    )
    rows = predict_feature_files(
        predictor, args.feature_files,
        top_n=args.top_n, batch_size=args.batch_size,
    )
    write_predictions_csv(rows, args.output, top_n=args.top_n)
    logger.info(
        "%d points from %d files -> %s",
        len(rows), len(args.feature_files), args.output,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
