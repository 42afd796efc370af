"""LocalTracker tests: run lifecycle, logging surfaces, model registry."""

import json

import pandas as pd
import pytest

from mermaid_classifier_tpu.tracking.local_tracker import LocalTracker


@pytest.fixture()
def tracker(tmp_path):
    return LocalTracker(tmp_path / "tracking")


class TestRunLifecycle:
    def test_context_manager_status(self, tracker):
        with tracker.start_run("exp", "my-run") as run:
            run.log_param("alpha", 0.1)
        meta = json.loads((run.run_dir / "meta.json").read_text())
        assert meta["status"] == "FINISHED"
        assert meta["run_name"] == "my-run"

        with pytest.raises(RuntimeError):
            with tracker.start_run("exp") as failed_run:
                raise RuntimeError("boom")
        meta = json.loads((failed_run.run_dir / "meta.json").read_text())
        assert meta["status"] == "FAILED"

    def test_get_run_and_listing(self, tracker):
        with tracker.start_run("exp-a", "r1") as run:
            run.log_param("k", "v")
        found = tracker.get_run(run.run_id)
        assert found.params() == {"k": "v"}
        assert len(tracker.runs("exp-a")) == 1
        with pytest.raises(KeyError):
            tracker.get_run("nope")


class TestLogging:
    def test_params_metrics_history(self, tracker):
        with tracker.start_run("exp") as run:
            run.log_params({"a": 1, "b": "x", "obj": object()})
            for step in range(3):
                run.log_metric("epoch/val_loss", 1.0 - step * 0.1, step=step)
            run.log_metric("acc", 0.9)
        assert run.params()["a"] == 1
        assert isinstance(run.params()["obj"], str)
        history = run.metric_history("epoch/val_loss")
        assert [h["step"] for h in history] == [0, 1, 2]
        latest = run.latest_metrics()
        assert latest["acc"] == 0.9
        assert latest["epoch/val_loss"] == pytest.approx(0.8)

    def test_nan_metric_skipped(self, tracker):
        with tracker.start_run("exp") as run:
            run.log_metric("bad", float("nan"))
            run.log_metric("inf", float("inf"))
        assert run.latest_metrics() == {}

    def test_artifacts(self, tracker, tmp_path):
        with tracker.start_run("exp") as run:
            run.log_dict({"x": 1}, "config/params.yaml")
            run.log_dict({"y": 2}, "stats.json")
            run.log_dataframe(pd.DataFrame({"a": [1, 2]}), "tables/t.csv")
            run.log_text("hello", "notes.txt")
            local = tmp_path / "file.bin"
            local.write_bytes(b"data")
            run.log_artifact(local)
        arts = run.list_artifacts()
        assert "config/params.yaml" in arts
        assert "stats.json" in arts
        assert "tables/t.csv" in arts
        assert "file.bin" in arts
        assert run.artifact("notes.txt").read_text() == "hello"
        with pytest.raises(ValueError, match="escapes"):
            run.log_text("x", "../outside.txt")

    def test_log_figure_closes(self, tracker):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        with tracker.start_run("exp") as run:
            fig, ax = plt.subplots()
            ax.plot([1, 2])
            fignum = fig.number
            run.log_figure(fig, "plots/line.png")
        assert run.artifact("plots/line.png").stat().st_size > 0
        # log_figure closes THE logged figure (other tests may leak theirs).
        assert not plt.fignum_exists(fignum)

    def test_log_figure_save_kwargs_override_defaults(self, tracker):
        """Caller save kwargs win over the tight-bbox default: a dpi cap
        plus bbox_inches=None must shrink the raster to figsize*dpi exactly
        (the tight bbox would crop it), differentially vs the default save
        of an identical figure."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from PIL import Image

        def make():
            fig, ax = plt.subplots(figsize=(4, 4))
            ax.plot([1, 2])
            return fig

        with tracker.start_run("exp") as run:
            run.log_figure(make(), "plots/default.png")
            run.log_figure(
                make(), "plots/capped.png", dpi=50, bbox_inches=None
            )
        with Image.open(run.artifact("plots/capped.png")) as img:
            assert img.size == (200, 200)  # 4 in * 50 dpi, no tight crop
        with Image.open(run.artifact("plots/default.png")) as img:
            assert img.size != (200, 200)


class TestModelRegistry:
    def test_versioning(self, tracker, tmp_path):
        f1 = tmp_path / "model.npz"
        f1.write_bytes(b"v1-bytes")
        f2 = tmp_path / "model.json"
        f2.write_text("{}")
        with tracker.start_run("exp") as run:
            v1 = tracker.register_model("my-model", [f1, f2], run=run)
        assert v1.name == "v1"
        f1.write_bytes(b"v2-bytes")
        v2 = tracker.register_model("my-model", [f1, f2])
        assert v2.name == "v2"
        latest = tracker.latest_model_version("my-model")
        assert latest == v2
        assert (latest / "model.npz").read_bytes() == b"v2-bytes"
        meta = json.loads((v1 / "registry_meta.json").read_text())
        assert meta["run_id"] == run.run_id
        assert tracker.latest_model_version("unknown") is None
