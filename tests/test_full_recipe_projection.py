"""Unit pins for full_recipe_drive's VM projection of the headline.

The drive itself is a chip-scale run (committed records in docs/runs/);
what IS unit-testable is the projection formula: measured train stage
minus the environment-only components (host-memory-weather pre-touch +
tunnel-rate upload) plus the same upload at PCIe rate — the analog of
the bench bucket leg's ``projected_vm_pps``.
"""

import argparse
import importlib.util
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _load_drive():
    spec = importlib.util.spec_from_file_location(
        "full_recipe_drive", REPO / "scripts" / "full_recipe_drive.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("full_recipe_drive", mod)
    spec.loader.exec_module(mod)
    return mod


class TestProjectedVmMinutes:
    def _args(self, dim=4096, dtype="int8"):
        return argparse.Namespace(dim=dim, resident_dtype=dtype)

    def test_matches_the_int8_record_formula(self):
        """The committed int8 record's post-hoc projection and the
        in-script formula must be the same computation."""
        drive = _load_drive()
        metrics = {
            "resident/pretouch_seconds": 84.7,
            "resident/upload_stage_seconds": 185.0,
            "subsample/realized_total": 449099.0,
        }
        got = drive._project_vm_minutes(818.2, metrics, self._args())
        # 818.2 - 84.7 - 185.0 + 449099*4096*1/1e9/8 = 548.73 s -> 9.15
        assert got == 9.15

    def test_dtype_changes_only_the_wire_term(self):
        drive = _load_drive()
        metrics = {
            "resident/pretouch_seconds": 0.0,
            "resident/upload_stage_seconds": 0.0,
            "subsample/realized_total": 100_000.0,
        }
        f32 = drive._project_vm_minutes(600.0, metrics, self._args(dtype="float32"))
        i8 = drive._project_vm_minutes(600.0, metrics, self._args(dtype="int8"))
        # 100k x 4096: f32 wires 4x the bytes of int8; both add <1 s at
        # 8 GB/s, so the projections differ by under a second.
        assert f32 >= i8
        assert (f32 - i8) * 60.0 < 1.0

    def test_quantize_seconds_credited_back(self):
        """int8's host-side quantization is CPU work a real VM also pays:
        subtracting the whole upload stage without crediting it back
        would bias the projection low."""
        drive = _load_drive()
        base = {
            "resident/pretouch_seconds": 10.0,
            "resident/upload_stage_seconds": 100.0,
            "subsample/realized_total": 1000.0,
        }
        without = drive._project_vm_minutes(600.0, base, self._args())
        with_q = drive._project_vm_minutes(
            600.0, {**base, "resident/quantize_seconds": 30.0}, self._args()
        )
        assert (with_q - without) * 60.0 == pytest.approx(30.0, abs=0.61)

    def test_pipelined_runs_subtract_only_the_upload_tail(self):
        """With the pipelined fill->upload, most of the upload thread's
        lifetime overlaps the disk fill — only its serialized tail
        (upload_extra_wait_seconds) cost wall-clock, so only the tail is
        subtracted; legacy records without the key keep the old formula."""
        drive = _load_drive()
        base = {
            "resident/pretouch_seconds": 10.0,
            "resident/upload_stage_seconds": 100.0,
            "subsample/realized_total": 1000.0,
        }
        legacy = drive._project_vm_minutes(600.0, base, self._args())
        pipelined = drive._project_vm_minutes(
            600.0,
            {**base, "resident/upload_extra_wait_seconds": 20.0},
            self._args(),
        )
        # Legacy subtracts 100 s of upload; pipelined subtracts its 20 s
        # tail — the projection rises by the 80 s that never serialized.
        assert (pipelined - legacy) * 60.0 == pytest.approx(80.0, abs=0.61)

    def test_missing_budget_returns_none(self):
        drive = _load_drive()
        assert drive._project_vm_minutes(600.0, {}, self._args()) is None
        assert drive._project_vm_minutes(
            600.0, {"resident/pretouch_seconds": 1.0}, self._args()
        ) is None


class TestSynthesizeCorpus:
    def test_non_square_points_per_image(self, tmp_path):
        """Regression: a round-sqrt rowcol grid undershot non-square
        counts (50 -> 7x7 = 49 rowcols vs 50 features) and crashed the
        feature writer; every image must carry exactly points_per_image
        aligned rowcols/features/annotations."""
        import numpy as np

        drive = _load_drive()
        summary = drive.synthesize_corpus(
            tmp_path, pool_rows=150, n_classes=4, dim=8,
            points_per_image=50, n_sources=2, seed=0,
        )
        assert summary["images"] == 3
        import pyarrow.parquet as pq

        ann = pq.read_table(tmp_path / "etl_annotations.parquet")
        assert ann.num_rows == 150
        from mermaid_classifier_tpu.data.features_io import read_feature_file

        feature_files = sorted((tmp_path / "store").rglob("*.features.npz"))
        assert len(feature_files) == 3
        rowcols, feats = read_feature_file(feature_files[0])
        assert len(rowcols) == 50 and feats.shape == (50, 8)


class TestWaitForLink:
    """The healthy-window gate: probe until sustained H2D clears the
    threshold, give up after the wait budget, always record the outcome."""

    def _run(self, readings, **kw):
        drive = _load_drive()
        seq = iter(readings)
        sleeps = []
        t = [0.0]

        def fake_sleep(s):
            sleeps.append(s)
            t[0] += s

        result = drive.wait_for_link(
            lambda: next(seq), sleep=fake_sleep, clock=lambda: t[0], **kw
        )
        return result, sleeps

    def test_no_gate_probes_once(self):
        result, sleeps = self._run(
            [{"h2d_mbps_sustained": 4.0}], min_mbps=0.0
        )
        assert result["probes"] == 1 and sleeps == []
        assert "gate_met" not in result

    def test_waits_until_healthy(self):
        result, sleeps = self._run(
            [{"h2d_mbps_sustained": 8.0},
             {"h2d_mbps_sustained": 12.0},
             {"h2d_mbps_sustained": 27.5}],
            min_mbps=20.0, interval_seconds=480.0,
        )
        assert result["gate_met"] is True
        assert result["h2d_mbps_sustained"] == 27.5
        assert result["probes"] == 3 and len(sleeps) == 2

    def test_gives_up_after_budget_and_says_so(self):
        result, _ = self._run(
            [{"h2d_mbps_sustained": 5.0}] * 10,
            min_mbps=20.0, max_wait_minutes=20.0, interval_seconds=480.0,
        )
        assert result["gate_met"] is False
        assert result["probes"] == 4  # 3 sleeps x 8 min > 20 min budget
        assert result["gate_mbps"] == 20.0

    def test_probe_error_is_not_a_pass(self):
        """An advisory probe failure ({'error': ...}) must not satisfy the
        gate — it reads as 0 MB/s and keeps waiting."""
        result, _ = self._run(
            [{"error": "timeout"}, {"h2d_mbps_sustained": 25.0}],
            min_mbps=20.0,
        )
        assert result["gate_met"] is True and result["probes"] == 2
