#!/usr/bin/env python
"""Generate a committed training-config dir from the taxonomy + annotation
counts (reference analog: scripts/generate_training_config.py).

Usage:
    python scripts/generate_training_config.py \
        --counts-csv counts.csv            # columns ba_id, gf_id, count \
        --output-dir config/ \
        [--top-n 100] [--exclude "Unknown" --exclude "Trash"] \
        [--sources-csv sources.csv] \
        [--taxonomy-fixture-dir fixtures/]  # offline; default hits the API
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("generate_training_config")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--counts-csv", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--top-n", type=int, default=100)
    parser.add_argument("--exclude", action="append", default=[])
    parser.add_argument("--sources-csv", default=None)
    parser.add_argument("--taxonomy-fixture-dir", default=None)
    parser.add_argument("--total-annotations", type=int, default=500_000)
    parser.add_argument("--min-per-class", type=int, default=200)
    parser.add_argument("--epochs", type=int, default=40)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")

    import pandas as pd

    if args.taxonomy_fixture_dir:
        import os

        from mermaid_classifier_tpu.common.taxonomy import TAXONOMY_FIXTURE_ENV

        os.environ[TAXONOMY_FIXTURE_ENV] = args.taxonomy_fixture_dir
    from mermaid_classifier_tpu.common.taxonomy import (
        get_benthic_attribute_library,
        get_growth_form_library,
    )
    from mermaid_classifier_tpu.config.generate import (
        select_labels,
        write_config_dir,
    )

    ba_library = get_benthic_attribute_library()
    gf_library = get_growth_form_library()
    counts = pd.read_csv(args.counts_csv, keep_default_na=False)

    generated = select_labels(
        ba_library,
        counts,
        top_n=args.top_n,
        excluded_names=set(args.exclude),
        gf_library=gf_library,
    )
    sources = None
    if args.sources_csv:
        sources = [str(v) for v in pd.read_csv(args.sources_csv).iloc[:, 0]]
    out = write_config_dir(
        args.output_dir,
        generated,
        ba_library,
        sources=sources,
        total_annotations=args.total_annotations,
        min_per_class=args.min_per_class,
        epochs=args.epochs,
    )
    logger.info(
        "wrote %s: %d labels, %d rollups, %d excluded",
        out,
        generated.n_labels,
        len(generated.rollups),
        len(generated.excluded),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
