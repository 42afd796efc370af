"""Pins for the record-attempt history collector.

Any new best C2 record is committed alongside the FULL attempt history
from its retry session (scripts/collect_recipe_attempts.py), so the
"best" is always read against the weather distribution it was drawn
from — the collector must keep every attempt, in order, with the probe
and the weather-sensitive breakdown components intact.
"""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _load():
    spec = importlib.util.spec_from_file_location(
        "collect_recipe_attempts",
        REPO / "scripts" / "collect_recipe_attempts.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("collect_recipe_attempts", mod)
    spec.loader.exec_module(mod)
    return mod


def _attempt(minutes, probe_mbps, extra_wait):
    return {
        "train_full_recipe_minutes": minutes,
        "projected_vm_train_minutes": minutes - 2.0,
        "accuracy": 0.8273,
        "balanced_accuracy": 0.8007,
        "log_loss": 0.9022,
        "export_parity_max_abs_diff": 7.7e-07,
        "link_probe": {"h2d_mbps_sustained": probe_mbps, "gate_met": True},
        "link_note": "test attempt",
        "train_stage_breakdown": {
            "epochs_seconds": 35.0,
            "upload_stage_seconds": 60.0 + extra_wait,
            "upload_extra_wait_seconds": extra_wait,
            "irrelevant_giant_blob": list(range(50)),
        },
    }


class TestCollect:
    def test_keeps_every_attempt_in_order(self, tmp_path):
        mod = _load()
        for i, minutes in enumerate([6.93, 5.4, 7.2]):
            (tmp_path / f"attempt_{i}.json").write_text(
                json.dumps(_attempt(minutes, 30.0, 10.0 * i))
            )
        rec = mod.collect(tmp_path)
        assert rec["n_attempts"] == 3
        assert [a["attempt"] for a in rec["attempts"]] == [
            "attempt_0", "attempt_1", "attempt_2",
        ]
        assert rec["best_minutes"] == 5.4
        assert rec["worst_minutes"] == 7.2
        # The weather evidence rides along…
        first = rec["attempts"][0]
        assert first["link_probe"]["h2d_mbps_sustained"] == 30.0
        assert (
            first["train_stage_breakdown"]["upload_extra_wait_seconds"]
            == 0.0
        )
        # …but unbounded blobs do not.
        assert "irrelevant_giant_blob" not in first["train_stage_breakdown"]

    def test_refuses_empty_dir(self, tmp_path):
        mod = _load()
        with pytest.raises(SystemExit):
            mod.collect(tmp_path)
