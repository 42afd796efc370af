#!/usr/bin/env python
"""Local training driver: committed YAML config dir -> trained, tracked,
registered artifact.

Rebuild of the reference's local train CLI
(reference: scripts/classifier_train.py:1-111): the SAME config dir drives
local and remote runs (single source of truth), the env block applies before
heavy imports, and the runner factory is patchable so launcher tests run
without pulling in jax.

Usage:
    python scripts/classifier_train.py --config-dir path/to/config \
        [--config-name training_config.yaml] [--run-name NAME]
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("classifier_train")


def _resolve_runner_factory():
    """Lazy import hook — patched by tests so the script is testable without
    importing the training stack (reference: classifier_train.py:62-66)."""
    from mermaid_classifier_tpu.train.runner import TrackingTrainingRunner

    return TrackingTrainingRunner


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-dir", required=True)
    parser.add_argument("--config-name", default="training_config.yaml")
    parser.add_argument("--run-name", default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s"
    )
    # A hung run must be diagnosable: SIGUSR1 dumps every thread's Python
    # stack to stderr without killing the process (long TPU drives stall
    # silently when a transfer or remote compile wedges).
    import faulthandler
    import signal

    faulthandler.enable()
    faulthandler.register(signal.SIGUSR1, all_threads=True, chain=False)
    # Honor JAX_PLATFORMS even under plugins that ignore the env var (the
    # axon TPU plugin does) — pin via config before any device use.
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass  # backends already initialized; leave as-is
    # Console INFO above; a fresh DEBUG trace file per run alongside it
    # (reference: utils.py:11-46).
    from mermaid_classifier_tpu.utils.logging_config import (
        logging_config_for_script,
    )

    debug_file = logging_config_for_script("classifier_train")
    logger.info("debug log: %s", debug_file)

    config_path = Path(args.config_dir) / args.config_name
    # Load + apply env BEFORE importing the training stack: the env block can
    # carry settings the import-time Settings read depends on.
    from mermaid_classifier_tpu.config.run_config import TrainingRunConfig

    config = TrainingRunConfig.from_yaml_path(config_path)
    config.apply_env()

    # Settings were loaded at import time of the settings module; re-read so
    # the env block takes effect for this process.
    import mermaid_classifier_tpu.config.settings as settings_mod

    settings_mod.reload_settings_from_env()

    dataset_options, training_options, tracking_options = config.build_options()

    runner_factory = _resolve_runner_factory()
    runner = runner_factory(
        dataset_options=dataset_options,
        training_options=training_options,
        tracking_options=tracking_options,
    )
    return_msg, registered = runner.run(run_name=args.run_name)
    logger.info("Final accuracy: %s", return_msg.acc if return_msg else None)
    logger.info("Registered model: %s", registered)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
