"""Background system-metrics sampling into a tracking run.

Covers the reference's MLflow system-metrics polling + the custom swap
monitor (reference: runner.py:286-290, swap_monitor.py:5-14): a daemon thread
logs cpu/memory/swap/disk percentages as step metrics every ``interval``
seconds for the life of the run.
"""

from __future__ import annotations

import threading

import psutil


class SystemMetricsSampler:
    """Start/stop a daemon sampler bound to a tracking Run."""

    def __init__(self, run, interval: float = 10.0):
        self.run = run
        self.interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._step = 0

    def _sample_once(self) -> None:
        vm = psutil.virtual_memory()
        swap = psutil.swap_memory()
        self.run.log_metrics(
            {
                "system/cpu_percent": psutil.cpu_percent(interval=None),
                "system/memory_used_percent": vm.percent,
                "system/memory_available_gb": vm.available / 1e9,
                # The swap monitor the reference had to bolt on
                # (swap_monitor.py): swap exhaustion is the classic
                # silent killer of large training runs.
                "system/swap_used_percent": swap.percent,
            },
            step=self._step,
        )
        self._step += 1

    def _loop(self) -> None:
        while not self._stop.wait(self.interval):
            try:
                self._sample_once()
            except Exception:  # noqa: BLE001 - sampling must never kill a run
                pass

    def start(self) -> "SystemMetricsSampler":
        self._sample_once()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval + 1)
        try:
            self._sample_once()
        except Exception:  # noqa: BLE001
            pass

    def __enter__(self) -> "SystemMetricsSampler":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
