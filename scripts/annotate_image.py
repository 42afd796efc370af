#!/usr/bin/env python
"""Classify one image's annotated points and write predictions + overlay
(CLI over serve.annotation; reference analog: the annotation viewer,
mermaid_classifier/pyspacer/annotation.py).

Usage:
    python scripts/annotate_image.py --image reef.jpg --points points.csv \
        --classifier models:/mermaid-mlp-prod \
        [--output-dir out/] [--top-n 3] [--backbone-weights weights.npz]
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("annotate_image")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image", required=True,
                        help="local path, store://bucket/key, or a numeric"
                        " CoralNet image ID")
    parser.add_argument("--coralnet-cache-dir", default=None,
                        help="cache dir for CoralNet-ID image downloads")
    parser.add_argument("--points", required=True)
    parser.add_argument("--classifier", required=True)
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--top-n", type=int, default=3)
    parser.add_argument("--backbone-weights", default=None)
    parser.add_argument(
        "--backbone-padding", default=None,
        choices=("symmetric", "tf_same"),
        help="conv padding semantics; real pyspacer-lineage weights need"
        " tf_same (scripts/diff_backbone.py --padding auto decides)",
    )
    parser.add_argument("--tracker-root", default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")

    from mermaid_classifier_tpu.models.extractor import build_extractor
    from mermaid_classifier_tpu.serve.annotation import (
        AnnotationRun,
        write_run_report,
    )

    weights = None
    config = None
    if args.backbone_weights:
        from mermaid_classifier_tpu.models.convert import load_backbone_bundle

        # Sidecar (written at conversion time) carries the padding/bn_eps
        # lineage decision; --backbone-padding stays as an override.
        weights, config = load_backbone_bundle(args.backbone_weights)
        if config is not None:
            logger.info("backbone sidecar config: padding=%s bn_eps=%g",
                        config.padding, config.bn_eps)
    if args.backbone_padding is not None:
        import dataclasses

        from mermaid_classifier_tpu.models.efficientnet import (
            EfficientNetConfig,
        )

        config = dataclasses.replace(
            config or EfficientNetConfig(), padding=args.backbone_padding
        )
    extractor = build_extractor(weights, config=config)

    from mermaid_classifier_tpu.serve.image_sources import ImageFetcher

    run = AnnotationRun(
        args.image,
        args.points,
        args.classifier,
        extractor=extractor,
        top_n=args.top_n,
        tracker_root=args.tracker_root,
        fetcher=ImageFetcher(cache_dir=args.coralnet_cache_dir),
    )
    if args.output_dir:
        out = write_run_report(run, args.output_dir)
        logger.info("wrote %s", out)
    else:
        run.write_predictions()
        logger.info("wrote predictions back to %s", args.points)
    summary = run.summary()
    logger.info("%d points: %s", summary["n_points"], summary["label_counts"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
