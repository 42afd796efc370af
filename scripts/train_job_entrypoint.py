#!/usr/bin/env python
"""Container/job training entrypoint with staged failure markers
(reference analog: scripts/sagemaker_train_entrypoint.py:39-176).

Emits a first-line debug dump (versions, redacted env, config listing),
then runs the same config->options->runner flow as classifier_train.py with
explicit ENTER/FAIL/EXIT stage markers so a dead job's log states exactly
which stage died. Exits 1 on any failure.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("train_job_entrypoint")

_REDACT = ("KEY", "SECRET", "TOKEN", "PASSWORD", "CREDENTIAL")


def _debug_dump(config_dir: Path) -> None:
    import platform

    logger.info("python %s on %s", platform.python_version(), platform.platform())
    try:
        import jax

        logger.info("jax %s", jax.__version__)
    except Exception as exc:  # noqa: BLE001
        logger.info("jax unavailable at dump time: %s", exc)
    for key in sorted(os.environ):
        value = os.environ[key]
        if any(tok in key.upper() for tok in _REDACT):
            value = "<redacted>"
        logger.debug("env %s=%s", key, value)
    if config_dir.is_dir():
        logger.info("config dir %s: %s", config_dir,
                    sorted(p.name for p in config_dir.iterdir()))
    else:
        logger.warning("config dir %s does not exist", config_dir)


def _stage(name: str):
    class _Marker:
        def __enter__(self):
            logger.info("==== ENTER %s", name)

        def __exit__(self, exc_type, exc, tb):
            if exc_type is not None:
                logger.error("==== FAIL %s: %s", name, exc)
            else:
                logger.info("==== EXIT %s", name)
            return False

    return _Marker()


def _resolve_runner_factory():
    """Import hook for the runner class; tests patch this to drive the
    entrypoint without pulling the full training stack (the reference
    launcher tests use the same seam, sagemaker_train_entrypoint.py:103-111)."""
    from mermaid_classifier_tpu.train.runner import TrackingTrainingRunner

    return TrackingTrainingRunner


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-dir", required=True)
    parser.add_argument("--config-name", default="training_config.yaml")
    parser.add_argument("--run-name", default=None)
    args = parser.parse_args(argv)

    # stdout logging for job-log collectors (reference: :39-44).
    logging.basicConfig(
        stream=sys.stdout,
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )
    # Honor JAX_PLATFORMS even under plugins that ignore the env var (the
    # axon TPU plugin does) — pin via config before any device use.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass

    config_dir = Path(args.config_dir)
    _debug_dump(config_dir)

    try:
        with _stage("load_config"):
            from mermaid_classifier_tpu.config.run_config import TrainingRunConfig

            config = TrainingRunConfig.from_yaml_path(
                config_dir / args.config_name
            )
        with _stage("apply_env"):
            config.apply_env()
            import mermaid_classifier_tpu.config.settings as settings_mod

            settings_mod.reload_settings_from_env()
        with _stage("build_options"):
            dataset_options, training_options, tracking_options = (
                config.build_options()
            )
        with _stage("runner_run"):
            runner_factory = _resolve_runner_factory()
            runner = runner_factory(
                dataset_options=dataset_options,
                training_options=training_options,
                tracking_options=tracking_options,
            )
            runner.run(run_name=args.run_name)
    except Exception:  # noqa: BLE001 - the job contract is exit 1 + traceback
        traceback.print_exc()
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
