"""The machine-scaled e2e deadline: scaling, capping, and the
stage-naming timeout failure contract."""

import subprocess
import sys

import pytest

from tests.common import e2e_harness


class TestDeadline:
    def test_factor_floor_is_one(self, monkeypatch):
        """A machine FASTER than the calibration host never shrinks the
        deadline below its base."""
        e2e_harness.machine_speed_factor.cache_clear()
        monkeypatch.setattr(e2e_harness, "PROBE_REF_SECONDS", 1e9)
        try:
            assert e2e_harness.machine_speed_factor() == 1.0
            assert (
                e2e_harness.e2e_deadline_seconds()
                == e2e_harness.BASE_DEADLINE_SECONDS
            )
        finally:
            e2e_harness.machine_speed_factor.cache_clear()

    def test_deadline_scales_and_caps(self, monkeypatch):
        monkeypatch.setattr(
            e2e_harness, "machine_speed_factor", lambda: 2.5
        )
        assert e2e_harness.e2e_deadline_seconds() == pytest.approx(
            e2e_harness.BASE_DEADLINE_SECONDS * 2.5
        )
        monkeypatch.setattr(
            e2e_harness, "machine_speed_factor", lambda: 1e6
        )
        assert (
            e2e_harness.e2e_deadline_seconds()
            == e2e_harness.MAX_DEADLINE_SECONDS
        )

    def test_timeout_failure_names_the_stage(self, monkeypatch):
        """On deadline the AssertionError carries the child's output tail,
        so the last stage-done marker identifies the culprit."""
        # Generous mock deadline: the child must get far enough to print
        # its marker even on a loaded 1-vCPU host.
        monkeypatch.setattr(
            e2e_harness, "e2e_deadline_seconds", lambda: 5.0
        )
        with pytest.raises(AssertionError) as exc:
            e2e_harness.run_e2e(
                [
                    sys.executable, "-c",
                    "import sys, time;"
                    " print('[e2e] stage-done synthesize in 0.1s',"
                    " flush=True); time.sleep(30)",
                ],
                cwd=".",
            )
        message = str(exc.value)
        assert "machine-scaled deadline" in message
        assert "stage-done synthesize" in message

    def test_completed_process_passes_through(self):
        proc = e2e_harness.run_e2e(
            [sys.executable, "-c", "print('PASS')"], cwd="."
        )
        assert isinstance(proc, subprocess.CompletedProcess)
        assert proc.returncode == 0 and "PASS" in proc.stdout
