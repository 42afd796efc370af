#!/usr/bin/env python
"""CLI for the feature-bucket builder: at-scale, resumable point-feature
extraction (reference analog: scripts/build_feature_bucket.py:829-923).

Usage:
    python scripts/build_feature_bucket.py \
        --source-ids 1,2,3            # or --source-ids-csv sources.csv \
        --source-bucket reef-images --target-bucket reef-features \
        [--no-skip-existing] [--verify-numerics] \
        [--progress-log progress.jsonl] [--error-log errors.csv] \
        [--backbone-weights weights.npz]

Exit code is 1 when any image failed (reference: :919).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("build_feature_bucket")


def parse_source_ids(args) -> list[str]:
    """Source IDs from --source-ids or a CSV with a source_id column
    (auto-detecting the column with an explicit override, normalizing
    whitespace/blank/float-formatted IDs, and dropping duplicates while
    preserving order — reference: :218-260). Both entry points get the
    SAME normalize+dedup; NA-like strings ('NA', 'null', …) are real IDs
    here, never pandas sentinels, and only the unambiguous float64-column
    artifact ('123.0') is rewritten — zero-padded, scientific-notation-
    looking, or fractional IDs pass through untouched."""
    if args.source_ids:
        return _normalize_source_ids(
            s.strip() for s in args.source_ids.split(",")
        )
    import pandas as pd

    # dtype=str: IDs are opaque strings — pandas' numeric inference would
    # mangle '007' -> 7 and '5e2' -> 500.0 at read time, before any
    # normalization could protect them. keep_default_na=False: 'NA'-like
    # IDs are real IDs, not sentinels.
    df = pd.read_csv(args.source_ids_csv, dtype=str, keep_default_na=False)
    cols = list(df.columns)
    override = getattr(args, "source_id_column", None)
    if override:
        if override not in cols:
            raise ValueError(
                f"--source-id-column={override!r} not found in"
                f" {args.source_ids_csv}; has {cols}"
            )
        col = override
    else:
        for candidate in ("source_id", "source id", "source", "id"):
            if candidate in cols:
                col = candidate
                break
        else:
            if len(cols) == 1:
                col = cols[0]
            else:
                raise ValueError(
                    f"cannot find a source-id column in"
                    f" {args.source_ids_csv}; tried source_id/'source id'/"
                    f"source/id, has {cols}. Pass --source-id-column."
                )
    return _normalize_source_ids(str(v).strip() for v in df[col].tolist())


def _normalize_source_ids(values) -> list[str]:
    import re

    # ONLY the pandas float64-column artifact: digits + '.0' exactly.
    # '007' (zero-padded), '5e2', '123.5', 'inf', 'NA' are all
    # legitimate opaque IDs and pass through unchanged.
    _FLOAT_ARTIFACT_RE = re.compile(r"^(\d+)\.0$")
    seen: set[str] = set()
    out: list[str] = []
    for v in values:
        if not v:
            continue
        m = _FLOAT_ARTIFACT_RE.match(v)
        if m:
            v = m.group(1)
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--source-ids", default=None)
    group.add_argument("--source-ids-csv", default=None)
    parser.add_argument("--source-id-column", default=None,
                        help="explicit source-ID column in --source-ids-csv"
                        " (default: auto-detect source_id/'source id'/"
                        "source/id, or the only column)")
    parser.add_argument("--source-bucket", required=True)
    parser.add_argument("--target-bucket", required=True)
    parser.add_argument("--no-skip-existing", action="store_true")
    parser.add_argument("--verify-numerics", action="store_true")
    parser.add_argument("--progress-log", default=None)
    parser.add_argument("--error-log", default=None)
    parser.add_argument("--backbone-weights", default=None)
    parser.add_argument("--backbone-batch", type=int, default=128)
    parser.add_argument(
        "--decode-workers", type=int, default=8,
        help="host JPEG-decode threads feeding the device pipeline"
        " (~8 keeps one chip fed at production image sizes)",
    )
    parser.add_argument(
        "--mesh-devices", type=int, default=None,
        help="shard the backbone batch over an N-device mesh"
        " (default: single device)",
    )
    parser.add_argument(
        "--compute-dtype", choices=("float32", "bfloat16"), default=None,
        help="backbone trunk dtype; bfloat16 is the fast path behind the"
        " cosine numerics gate (pass --verify-numerics)",
    )
    parser.add_argument(
        "--backbone-config-json", default=None,
        help="EfficientNetConfig.to_dict() JSON path overriding the"
        " production B0 (integration tests / alternative backbones)",
    )
    parser.add_argument(
        "--backbone-variant", default=None,
        # Mirrors models/efficientnet.py VARIANT_COEFFS (kept literal so
        # --help stays import-free; guard-tested in test_efficientnet).
        choices=("b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7"),
        help="compound-scaled EfficientNet preset (default: production"
        " b0); mutually exclusive with --backbone-config-json",
    )
    parser.add_argument(
        "--backbone-padding", default=None,
        choices=("symmetric", "tf_same"),
        help="conv padding semantics; real pyspacer-lineage weights"
        " (lukemelas naming) need tf_same to reproduce the reference's"
        " features (<1e-4 MAE contract — scripts/diff_backbone.py)",
    )
    parser.add_argument(
        "--backbone-impl", default=None,
        choices=("folded", "flax", "fused"),
        help="backbone schedule (default: the BN-folded fast path, single"
        " device or sharded; docs/perf_roofline.md §3.2)",
    )
    return parser


def resolve_backbone(args):
    """Weights + effective EfficientNetConfig from the CLI flags.

    Resolution order: explicit --backbone-config-json / --backbone-variant
    win outright; otherwise the weight bundle's .config.json sidecar (the
    padding/bn_eps lineage decision recorded at conversion time by
    diff_backbone --save-npz) is the default; --compute-dtype and
    --backbone-padding override individual fields of whichever base won.
    Returns ``(weights | None, config | None)`` — (None, None) means the
    seeded-random default backbone.
    """
    import dataclasses

    weights = None
    sidecar_config = None
    if args.backbone_weights:
        from mermaid_classifier_tpu.models.convert import load_backbone_bundle

        weights, sidecar_config = load_backbone_bundle(args.backbone_weights)
        if sidecar_config is not None:
            logger.info(
                "backbone sidecar config: padding=%s bn_eps=%g",
                sidecar_config.padding, sidecar_config.bn_eps,
            )

    config = None
    if args.backbone_config_json:
        if args.backbone_variant:
            raise SystemExit(
                "--backbone-variant and --backbone-config-json are mutually"
                " exclusive"
            )
        import json

        from mermaid_classifier_tpu.models.efficientnet import EfficientNetConfig

        with open(args.backbone_config_json) as f:
            config_dict = json.load(f)
        # An explicit flag wins; otherwise the config file's dtype stands.
        if args.compute_dtype is not None:
            config_dict["compute_dtype"] = args.compute_dtype
        config = EfficientNetConfig.from_dict(config_dict)
    elif args.backbone_variant:
        from mermaid_classifier_tpu.models.efficientnet import variant_config

        config = variant_config(
            args.backbone_variant,
            compute_dtype=args.compute_dtype or "float32",
        )
    elif sidecar_config is not None:
        config = sidecar_config
        if args.compute_dtype is not None:
            config = dataclasses.replace(
                config, compute_dtype=args.compute_dtype
            )
    elif args.compute_dtype is not None and args.compute_dtype != "float32":
        from mermaid_classifier_tpu.models.efficientnet import EfficientNetConfig

        config = EfficientNetConfig(compute_dtype=args.compute_dtype)

    if args.backbone_padding is not None:
        from mermaid_classifier_tpu.models.efficientnet import (
            EfficientNetConfig,
        )

        config = dataclasses.replace(
            config or EfficientNetConfig(), padding=args.backbone_padding
        )
    return weights, config


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")

    # Honor JAX_PLATFORMS even when a plugin ignores the env var (the axon
    # TPU plugin does; see CLAUDE.md) — pin via config before any device use.
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass  # backends already initialized; leave as-is

    source_ids = parse_source_ids(args)
    logger.info("sources to process: %s", source_ids)

    from mermaid_classifier_tpu.data.feature_bucket import FeatureBucketBuilder
    from mermaid_classifier_tpu.data.store import get_default_store
    from mermaid_classifier_tpu.models.extractor import build_extractor

    weights, config = resolve_backbone(args)

    mesh = None
    if args.mesh_devices:
        from mermaid_classifier_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_devices)

    extractor = build_extractor(
        weights, config=config, backbone_batch=args.backbone_batch, mesh=mesh,
        backbone_impl=args.backbone_impl,
    )
    builder = FeatureBucketBuilder(
        get_default_store(),
        args.source_bucket,
        args.target_bucket,
        extractor,
        skip_existing=not args.no_skip_existing,
        progress_log=args.progress_log,
        error_log=args.error_log,
        decode_workers=args.decode_workers,
    )
    available, missing = builder.filter_to_available_sources(source_ids)
    if not available:
        logger.error("none of the requested sources are available; aborting")
        return 1
    # Reduced-precision trunks never run ungated (CLAUDE.md invariant):
    # the cosine check vs the float32 reference is mandatory for them.
    effective_dtype = (config.compute_dtype if config is not None
                       else (args.compute_dtype or "float32"))
    verify = args.verify_numerics or effective_dtype != "float32"
    if verify and not args.verify_numerics:
        logger.info(
            "compute_dtype=%s: device-numerics gate enforced automatically",
            effective_dtype,
        )
    result = builder.run(available, verify_numerics=verify)
    logger.info(result.describe())
    return result.exit_code


if __name__ == "__main__":
    raise SystemExit(main())
