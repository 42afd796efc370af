"""Guard the committed run-record evidence base against silent rot.

The verdicts (and bench.py's full_recipe_committed_record block) lean on
docs/runs/*.json as the performance evidence; this test asserts every
committed record parses, carries the keys the comparisons rely on, and is
indexed in docs/runs/README.md — so a record can't be added (or edited)
without the evidence contract holding. Mirrors the reference's habit of
keeping its benchmark tables inside reviewed docs (reference:
docs/research/balancing-experiments.md:49-84).
"""

import json
import math
from pathlib import Path

import pytest

RUNS_DIR = Path(__file__).resolve().parents[1] / "docs" / "runs"

#: Records committed before the full-schema discipline existed. FROZEN —
#: never add to this list; new records must carry the full schema.
LEGACY_RECORDS = {
    "full_recipe_2026-08-17.json",
    "full_recipe_bf16_2026-08-17.json",
    "full_recipe_weather_2026-08-17.json",
}

#: Every record, legacy or not, must have these.
CORE_KEYS = {
    "train_full_recipe_minutes",
    "stage_seconds",
    "accuracy",
    "balanced_accuracy",
    "log_loss",
    "export_parity_max_abs_diff",
    "reference_minutes",
}

#: Post-legacy records must additionally decompose and project.
FULL_KEYS = CORE_KEYS | {
    "train_stage_breakdown",
    "projected_vm_train_minutes",
    "link_note",
}

#: Extraction-lane records (the bucket drive) have their own schema.
BUCKET_CORE_KEYS = {
    "images_total",
    "points_total",
    "stage_seconds",
    "kill_resume",
    "link_note",
}


def _records(prefix: str) -> list[Path]:
    return sorted(RUNS_DIR.glob(f"{prefix}*.json"))


def all_records() -> list[Path]:
    return sorted(RUNS_DIR.glob("*.json"))


def test_runs_dir_has_records():
    assert _records("full_recipe_"), "the committed C2 evidence vanished"


@pytest.mark.parametrize("path", all_records(), ids=lambda p: p.name)
def test_record_parses(path):
    data = json.loads(path.read_text())
    assert isinstance(data, dict) and data


@pytest.mark.parametrize(
    "path", _records("full_recipe_"), ids=lambda p: p.name
)
def test_full_recipe_record_schema(path):
    data = json.loads(path.read_text())
    required = CORE_KEYS if path.name in LEGACY_RECORDS else FULL_KEYS
    missing = sorted(required - data.keys())
    assert not missing, f"{path.name} lost required keys: {missing}"

    minutes = data["train_full_recipe_minutes"]
    assert isinstance(minutes, (int, float)) and 0 < minutes < 24 * 60
    assert isinstance(data["stage_seconds"], dict) and data["stage_seconds"]
    for key in ("accuracy", "balanced_accuracy"):
        assert 0.0 < data[key] <= 1.0, f"{path.name} {key}={data[key]}"
    assert math.isfinite(data["log_loss"]) and data["log_loss"] > 0
    # The artifact gate: nothing ships past 1e-6 (inference/export.py).
    assert data["export_parity_max_abs_diff"] <= 1e-6
    # Every record states its window conditions somewhere.
    assert any(k in data for k in ("link_note", "weather_note", "reference_note"))

    if path.name not in LEGACY_RECORDS:
        breakdown = data["train_stage_breakdown"]
        assert isinstance(breakdown, dict) and breakdown
        projected = data["projected_vm_train_minutes"]
        assert 0 < projected <= minutes + 1e-9, (
            f"{path.name}: the VM projection removes link overhead, it"
            f" can't exceed the measured minutes ({projected} > {minutes})"
        )


@pytest.mark.parametrize(
    "path", _records("feature_bucket_"), ids=lambda p: p.name
)
def test_feature_bucket_record_schema(path):
    data = json.loads(path.read_text())
    missing = sorted(BUCKET_CORE_KEYS - data.keys())
    assert not missing, f"{path.name} lost required keys: {missing}"
    assert data["images_total"] > 0 and data["points_total"] > 0
    kill_resume = data["kill_resume"]
    # The resume evidence must be explicit, not narrative: which images
    # were already done at resume, and that resumed output is
    # byte-identical to an uninterrupted build.
    for key in ("killed_mid_run", "done_before_resume", "identical_to_uninterrupted"):
        assert key in kill_resume, f"{path.name} kill_resume lacks {key}"
    assert kill_resume["identical_to_uninterrupted"] is True


def test_every_record_is_indexed():
    index = (RUNS_DIR / "README.md").read_text()
    unindexed = [p.name for p in all_records() if p.name not in index]
    assert not unindexed, (
        f"docs/runs/README.md does not mention: {unindexed} — every"
        " committed record must be indexed with what it demonstrates"
    )
