"""Section profiling: wall time + memory snapshots per pipeline phase
(reference: mermaid_classifier/pyspacer/_pipeline_utils.py:23-54).

The accumulated list is logged as a run artifact by the runner, the same
observability contract as the reference (reference: runner.py:353-354).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from datetime import datetime, timezone

import psutil


def _hms(seconds: float) -> str:
    m, s = divmod(int(round(seconds)), 60)
    h, m = divmod(m, 60)
    return f"{h:d}:{m:02d}:{s:02d}"


@contextmanager
def section_profiling(profiled_sections: list[dict], name: str):
    """Append {name, seconds, hms, started_at, memory_used_percent} to
    ``profiled_sections`` when the block exits (also on exceptions, so a
    failed run still shows where the time went)."""
    start = time.perf_counter()
    started_at = datetime.now(timezone.utc).isoformat(timespec="seconds")
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        profiled_sections.append(
            {
                "name": name,
                "seconds": round(elapsed, 3),
                "hms": _hms(elapsed),
                "started_at": started_at,
                "memory_used_percent": psutil.virtual_memory().percent,
            }
        )
