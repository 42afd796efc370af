"""Machine-robust harness for the subprocess e2e drives.

The e2e smoke's wall-clock is dominated by CPU speed (subprocess Python
startups + CPU-pinned training), which varies several-fold across the
machines that run this suite. A fixed deadline therefore flips between
"generous" and "always red" depending on the host — so the deadline is
scaled by a measured machine-speed probe instead: one timed run of the
heavy-import workload that dominates every CLI stage's startup.

Calibration (1-vCPU round-4 machine): probe ~3.4 s, full smoke ~226 s.
BASE_DEADLINE is ~3x that smoke time; a machine where the probe runs N×
slower gets an N×-scaled deadline (capped to keep a genuine hang bounded).

On timeout the runner fails with the tail of the captured output — the
smoke prints ``[e2e] stage-done <name> ...`` markers, so the failure names
the stage that blew the budget instead of a bare TimeoutExpired.
"""

from __future__ import annotations

import functools
import subprocess
import sys
import time

# Seconds the probe takes on the calibration machine (see module docstring).
PROBE_REF_SECONDS = 3.4
# Deadline on the calibration machine: ~3x its measured 226 s smoke run.
BASE_DEADLINE_SECONDS = 700.0
# Even a 10x-slower machine should not wait forever on a true hang.
MAX_DEADLINE_SECONDS = 5400.0


@functools.lru_cache(maxsize=1)
def machine_speed_factor() -> float:
    """How much slower this machine is than the calibration machine
    (>= 1.0), measured by one timed heavy-import subprocess.

    A host slow enough that the PROBE itself times out (cold heavy
    imports under host-memory weather can take minutes — CLAUDE.md) is
    exactly the host that needs the most generous deadline: the probe's
    own failure must never error the e2e test, so it degrades to the
    maximum factor instead of raising."""
    try:
        t0 = time.perf_counter()
        subprocess.run(
            [sys.executable, "-c", "import numpy, pandas, sklearn, jax"],
            check=True,
            capture_output=True,
            timeout=300,
        )
        elapsed = time.perf_counter() - t0
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError, OSError):
        return MAX_DEADLINE_SECONDS / BASE_DEADLINE_SECONDS
    return max(1.0, elapsed / PROBE_REF_SECONDS)


def e2e_deadline_seconds() -> float:
    return min(
        BASE_DEADLINE_SECONDS * machine_speed_factor(), MAX_DEADLINE_SECONDS
    )


def run_e2e(cmd: list[str], *, cwd, env=None) -> subprocess.CompletedProcess:
    """Run an e2e subprocess under the machine-scaled deadline.

    Returns the CompletedProcess on exit (pass/fail judged by the caller);
    on deadline, raises AssertionError whose message carries the deadline,
    the speed factor, and the output tail (the last ``[e2e] stage-done``
    marker identifies the stage that was running). Output goes through
    temp files, not pipes: on POSIX, ``subprocess.run`` discards partial
    output when the timeout fires, which is exactly when it matters.
    """
    import tempfile

    deadline = e2e_deadline_seconds()
    with tempfile.TemporaryFile(mode="w+") as out_f, \
            tempfile.TemporaryFile(mode="w+") as err_f:
        proc = subprocess.Popen(
            cmd, stdout=out_f, stderr=err_f, text=True, cwd=cwd, env=env,
        )
        try:
            returncode = proc.wait(timeout=deadline)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()

            def _tail(f) -> str:
                f.flush()
                f.seek(0)
                return f.read()[-4000:] or "<none>"

            raise AssertionError(
                f"e2e run exceeded the machine-scaled deadline of"
                f" {deadline:.0f}s (machine speed factor"
                f" {machine_speed_factor():.2f}x vs the"
                f" {PROBE_REF_SECONDS:.1f}s-probe calibration machine). The"
                " last '[e2e] stage-done' line below names the last"
                " COMPLETED stage; the stage after it is the one that blew"
                " the budget.\n"
                f"--- stdout tail ---\n{_tail(out_f)}\n"
                f"--- stderr tail ---\n{_tail(err_f)}"
            ) from None
        out_f.seek(0)
        err_f.seek(0)
        return subprocess.CompletedProcess(
            cmd, returncode, out_f.read(), err_f.read()
        )
