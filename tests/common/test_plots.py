"""Plot utility smoke tests (reference analog: tests/common/ plots coverage)."""

import unittest

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from mermaid_classifier_tpu.common.plots import (  # noqa: E402
    PointMarker,
    group_style,
    plot_legend,
    plot_point_markers,
)


class TestPlots(unittest.TestCase):
    def test_grouped_markers_and_styles(self):
        markers = [
            PointMarker(10, 20, group="coral", text="0.91"),
            PointMarker(30, 40, group="coral"),
            PointMarker(50, 60, group="algae", text="0.45"),
        ]
        fig, ax = plt.subplots()
        try:
            styles = plot_point_markers(ax, markers)
            self.assertEqual(list(styles), ["coral", "algae"])
            self.assertNotEqual(styles["coral"], styles["algae"])
            # Two scatter collections (one per group) were drawn.
            self.assertEqual(len(ax.collections), 2)
            # Two text annotations.
            self.assertEqual(len(ax.texts), 2)
        finally:
            plt.close(fig)

    def test_style_assignment_is_deterministic(self):
        self.assertEqual(group_style(0), group_style(0))
        self.assertNotEqual(group_style(0), group_style(1))

    def test_legend_figure(self):
        styles = {"coral": group_style(0), "algae": group_style(1)}
        fig = plot_legend(styles)
        try:
            legends = [c for c in fig.axes[0].get_children()
                       if isinstance(c, matplotlib.legend.Legend)]
            self.assertEqual(len(legends), 1)
            labels = [t.get_text() for t in legends[0].get_texts()]
            self.assertEqual(labels, ["coral", "algae"])
        finally:
            plt.close(fig)


if __name__ == "__main__":
    unittest.main()
