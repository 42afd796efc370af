"""Immutable artifact releases: validate, lay out, publish ``vN``.

Capability parity with the reference's release flow
(reference: scripts/release_artifact.py:40-198):

- version names are strictly ``v<digits>``;
- a release is IMMUTABLE: publishing over an existing version is refused
  before any byte is written;
- the artifact is re-validated at release time (load through the public
  loader, manifest task/classes/provenance checks) — a release never trusts
  that training-time validation still holds;
- the store layout is assembled with best-effort rollback on failure.

Layout: ``<bucket>/classifier/<version>/model.npz|model.json`` plus any
extra files (e.g. backbone weights) passed alongside.
"""

from __future__ import annotations

import json
import re
from logging import getLogger
from pathlib import Path

from mermaid_classifier_tpu.data.store import ObjectStore
from mermaid_classifier_tpu.inference import (
    SCHEMA_VERSION,
    TASK_NAME,
    ManifestError,
    load_predictor,
)

logger = getLogger(__name__)

_VERSION_RE = re.compile(r"^v\d+$")
RELEASE_PREFIX = "classifier"


class ReleaseError(RuntimeError):
    pass


def validate_version(version: str) -> None:
    if not _VERSION_RE.fullmatch(version):
        raise ReleaseError(
            f"release version must match ^v<digits>$, got {version!r}."
        )


def validate_artifact(artifact_dir: str | Path, *, task: str = TASK_NAME) -> dict:
    """Load + inspect an artifact directory; returns the manifest.

    Checks (reference: release_artifact.py:54-77): loadable through the one
    public loader; schema version; task name; non-empty classes; provenance
    block present.
    """
    artifact_dir = Path(artifact_dir)
    try:
        load_predictor(artifact_dir)
    except ManifestError as exc:
        raise ReleaseError(f"artifact failed load validation: {exc}") from exc
    manifest = json.loads((artifact_dir / "model.json").read_text())
    if manifest.get("schema_version") != SCHEMA_VERSION:
        raise ReleaseError(
            f"manifest schema_version {manifest.get('schema_version')!r} !="
            f" {SCHEMA_VERSION}."
        )
    if manifest.get("task") != task:
        raise ReleaseError(
            f"manifest task {manifest.get('task')!r} != expected {task!r}."
        )
    if not manifest.get("classes"):
        raise ReleaseError("manifest has no classes.")
    if not manifest.get("trained_with"):
        raise ReleaseError(
            "manifest has no trained_with provenance block; refusing to"
            " release an artifact of unknown origin."
        )
    return manifest


def release_artifact(
    store: ObjectStore,
    bucket: str,
    version: str,
    artifact_dir: str | Path,
    *,
    extra_files: list[str | Path] | None = None,
    task: str = TASK_NAME,
) -> list[str]:
    """Publish ``artifact_dir`` as the immutable ``version`` release.

    Returns the list of written keys. On any write failure, best-effort
    deletes everything already written (reference: release_artifact.py:94-137).
    """
    validate_version(version)
    artifact_dir = Path(artifact_dir)
    manifest = validate_artifact(artifact_dir, task=task)

    # Trailing slash: "classifier/v1" must not prefix-match "classifier/v12".
    prefix = f"{RELEASE_PREFIX}/{version}/"
    existing = list(store.list_keys(bucket, prefix=prefix))
    if existing:
        raise ReleaseError(
            f"release {version} already exists in {bucket} ({len(existing)}"
            f" objects under {prefix}) — releases are immutable."
        )

    files: list[Path] = [artifact_dir / "model.npz", artifact_dir / "model.json"]
    for f in extra_files or []:
        f = Path(f)
        if not f.is_file():
            raise ReleaseError(f"extra release file {f} does not exist.")
        files.append(f)

    written: list[str] = []
    try:
        for f in files:
            key = f"{prefix}{f.name}"
            store.put_bytes(bucket, key, f.read_bytes())
            written.append(key)
    except BaseException:
        logger.exception(
            "release %s failed mid-write; rolling back %d objects",
            version,
            len(written),
        )
        for key in written:
            try:
                store.delete(bucket, key)
            except Exception:  # noqa: BLE001 - rollback is best-effort
                logger.warning("rollback failed for %s/%s", bucket, key)
        raise

    logger.info(
        "released %s: %d files, %d classes, task=%s",
        version,
        len(written),
        len(manifest["classes"]),
        manifest["task"],
    )
    return written
