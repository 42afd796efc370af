"""HTML report generator tests (reference analog: generate_report coverage)."""

import unittest
import tempfile
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import pandas as pd  # noqa: E402

from mermaid_classifier_tpu.tracking.local_tracker import LocalTracker  # noqa: E402
from mermaid_classifier_tpu.tracking.report import generate_report  # noqa: E402


class TestGenerateReport(unittest.TestCase):
    def _make_run(self, root: Path):
        tracker = LocalTracker(root)
        run = tracker.start_run("exp", "run-one")
        run.log_params({"training/epochs": 10, "dataset/subsample": "balanced"})
        run.log_metric("accuracy", 0.81)
        for step, loss in enumerate([0.9, 0.5, 0.3]):
            run.log_metric("epoch/val_loss", loss, step=step)
        run.log_dataframe(
            pd.DataFrame({"ba_id": ["a", "b"], "count": [10, 20]}),
            "dataset/ba_counts.csv",
        )
        run.log_dict({"best_epoch": 1}, "early_stop_info.json")
        fig, ax = plt.subplots()
        ax.plot([0, 1], [1, 0])
        run.log_figure(fig, "metrics/calibration/reliability.png")
        plt.close(fig)
        run.end()
        return tracker, run

    def test_self_contained_html(self):
        with tempfile.TemporaryDirectory() as td:
            root = Path(td)
            tracker, run = self._make_run(root / "tracking")
            out = generate_report(run, root / "report.html")
            html = out.read_text()
            # Params, metrics, histories present.
            self.assertIn("epochs", html)
            self.assertIn("accuracy", html)
            self.assertIn("Per-step metric histories", html)
            # CSV rendered as a table, PNG inlined base64, JSON pretty.
            self.assertIn("ba_counts", html)
            self.assertIn("<td>20</td>", html)
            self.assertIn("data:image/png;base64,", html)
            self.assertIn("best_epoch", html)
            # Section titles from the declarative manifest.
            self.assertIn("Calibration", html)
            self.assertIn("Dataset", html)
            # No external references — self-contained.
            self.assertNotIn("src=\"http", html)

    def test_cli(self):
        import importlib.util
        import sys

        with tempfile.TemporaryDirectory() as td:
            root = Path(td)
            tracker, run = self._make_run(root / "tracking")
            spec = importlib.util.spec_from_file_location(
                "generate_report_cli",
                Path(__file__).resolve().parents[2] / "scripts" / "generate_report.py",
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[spec.name] = mod
            spec.loader.exec_module(mod)
            out = root / "r.html"
            rc = mod.main([
                "--run-id", run.run_id,
                "--tracking-root", str(root / "tracking"),
                "--output", str(out),
            ])
            self.assertEqual(rc, 0)
            self.assertIn("Run report", out.read_text())
            self.assertEqual(
                mod.main(["--run-id", "nope",
                          "--tracking-root", str(root / "tracking")]),
                1,
            )


if __name__ == "__main__":
    unittest.main()


def test_history_chart_handles_mixed_and_missing_steps():
    from mermaid_classifier_tpu.tracking.report import _render_history_chart

    # Stepped logs followed by a step-less summary: the stepped entries
    # ARE the series (sorted by step), and the step-less re-log is
    # excluded — a positional x would render it at the far left with a
    # bogus step label.
    history = [
        {"step": 500, "value": 0.5},
        {"step": 1000, "value": 0.4},
        {"step": None, "value": 0.35},
        {"step": 750, "value": 0.45},
        {"step": 20, "value": float("nan")},  # dropped
    ]
    svg = _render_history_chart("epoch/val_loss", history)
    assert svg.startswith("<svg")
    import re

    xs = [float(m.group(1)) for m in re.finditer(r"[ML]([\d.]+),", svg)]
    assert xs == sorted(xs), "chart line must be monotonic in x"
    assert len(xs) == 3  # NaN dropped, step-less summary excluded

    # A purely step-less history still charts by position.
    svg2 = _render_history_chart(
        "x", [{"step": None, "value": v} for v in (3.0, 2.0, 1.0)]
    )
    assert svg2.startswith("<svg")
