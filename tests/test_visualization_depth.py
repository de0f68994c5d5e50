"""Lineage/waveform visualization: graph flatten, layered layout, renderers.

Behavioral analog of the reference visualizer suite
(reference: utils/visualization/lineage_visualizer.py — 1,672 LoC of
layered layout + critical-path highlighting — and waveform_visualizer.py):
lineage dicts flatten into (nodes, edges, info), the layered layout puts
every dependency strictly left of its consumers, and the matplotlib/plotly
renderers draw without a display.
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.base import Plugin
from waveformanalysis_tpu.utils.visualization import (
    layered_layout,
    lineage_to_graph,
    plot_lineage_labview,
    plot_waveforms,
)


def _diamond_lineage():
    """a -> l, a -> r, (l, r) -> t (recursive lineage-dict shape)."""
    a = {"plugin_class": "A", "plugin_version": "1", "depends_on": {}}
    l = {"plugin_class": "L", "plugin_version": "1", "depends_on": {"a": a}}
    r = {"plugin_class": "R", "plugin_version": "2", "depends_on": {"a": a}}
    return {"plugin_class": "T", "plugin_version": "3",
            "depends_on": {"l": l, "r": r}}


class TestGraphFlatten:
    def test_nodes_edges_info(self):
        nodes, edges, info = lineage_to_graph(_diamond_lineage(), "t")
        assert set(nodes) == {"t", "l", "r", "a"}
        assert set(edges) == {("l", "t"), ("r", "t"), ("a", "l"), ("a", "r")}
        assert info["r"]["plugin_class"] == "R"
        assert info["t"]["version"] == "3"

    def test_shared_dependency_visited_once(self):
        nodes, edges, _ = lineage_to_graph(_diamond_lineage(), "t")
        assert nodes.count("a") == 1
        assert len(edges) == 4

    def test_single_node(self):
        nodes, edges, info = lineage_to_graph(
            {"plugin_class": "Solo", "depends_on": {}}, "solo"
        )
        assert nodes == ["solo"] and edges == []
        assert info["solo"]["plugin_class"] == "Solo"


class TestLayeredLayout:
    def test_dependencies_strictly_left_of_consumers(self):
        nodes, edges, _ = lineage_to_graph(_diamond_lineage(), "t")
        pos = layered_layout(nodes, edges)
        for src, dst in edges:
            assert pos[src][0] < pos[dst][0], (src, dst)

    def test_levels_are_longest_path_depth(self):
        nodes, edges, _ = lineage_to_graph(_diamond_lineage(), "t")
        pos = layered_layout(nodes, edges)
        assert pos["a"][0] == 0.0
        assert pos["l"][0] == pos["r"][0] == 1.0
        assert pos["t"][0] == 2.0

    def test_same_level_nodes_get_distinct_rows(self):
        nodes, edges, _ = lineage_to_graph(_diamond_lineage(), "t")
        pos = layered_layout(nodes, edges)
        assert pos["l"][1] != pos["r"][1]

    def test_cycle_tolerated(self):
        # defensive: a malformed lineage with a cycle must not hang
        pos = layered_layout(["x", "y"], [("x", "y"), ("y", "x")])
        assert set(pos) == {"x", "y"}


class TestRenderers:
    def test_labview_renderer_draws_all_nodes(self):
        ax = plot_lineage_labview(_diamond_lineage(), "t")
        texts = [t.get_text() for t in ax.texts]
        for name in ("t", "l", "r", "a"):
            assert any(name in s for s in texts)
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_critical_path_highlighting(self):
        class FakeAnalysis:
            critical_path = ["a", "l", "t"]
            bottlenecks = [("l", 1.0)]

        ax = plot_lineage_labview(
            _diamond_lineage(), "t", analysis_result=FakeAnalysis(),
            highlight_critical_path=True, highlight_bottlenecks=True,
        )
        colors = {p.get_facecolor() for p in ax.patches
                  if hasattr(p, "get_facecolor")}
        assert len(colors) >= 2  # highlighted nodes differ from the rest
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_context_plot_lineage_end_to_end(self, tmp_path):
        class A(Plugin):
            provides = "viz_a"

            def compute(self, context, run_id, **kwargs):
                return np.zeros(1, dtype=[("v", "i4")])

        class B(Plugin):
            provides = "viz_b"
            depends_on = ["viz_a"]

            def compute(self, context, run_id, **kwargs):
                return np.zeros(1, dtype=[("v", "i4")])

        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(A(), B())
        ax = ctx.plot_lineage("viz_b")
        assert ax is not None
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_plot_waveforms_with_baselines_and_hits(self):
        rng = np.random.default_rng(0)
        waves = 1000 + rng.normal(0, 3, (6, 64))
        hits = {"position": np.array([10, 30])}
        ax = plot_waveforms(waves, baselines=np.full(6, 1000.0), hits=hits)
        assert len(ax.lines) >= 6  # one line per event (+ markers)
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_plot_waveforms_caps_events(self):
        waves = np.zeros((40, 16))
        ax = plot_waveforms(waves, max_events=5)
        assert len(ax.lines) == 5
        import matplotlib.pyplot as plt

        plt.close("all")
