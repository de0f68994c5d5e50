"""Visualization feature depth: classification, wire styles, routing,
verbose text blocks, interactive handlers, channel-aware waveform viewer.

Behavioral analog of the reference visualizer internals
(reference: utils/visualization/lineage_visualizer.py — node-type color
classification :158, edge categories :475, wire styles :491, text fitting
:523, interactive hover/click :950 — and waveform_visualizer.py —
channel selectors :41, per-channel event view :59, browser :235).
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.hardware import HardwareChannel
from waveformanalysis_tpu.plugins.base import Plugin
from waveformanalysis_tpu.utils.visualization import (
    LineageStyle,
    _parse_channel_selector,
    classify_edge_category,
    classify_node_type,
    create_interactive_browser,
    estimate_node_height,
    format_node_info,
    layered_layout,
    lineage_to_graph,
    node_text_lines,
    order_layers,
    plot_lineage_labview,
    plot_waveforms,
    resolve_wire_style,
    route_edge,
    upstream_nodes,
    wrap_text_lines,
)


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


class TestNodeClassification:
    def test_raw_data_by_class_keywords(self):
        for cls in ("RawFilesPlugin", "CsvLoader", "V1725Reader"):
            assert classify_node_type("x", {"plugin_class": cls}) == "raw_data"

    def test_dataframe_by_key_class_or_dtype(self):
        assert classify_node_type("df", {"plugin_class": "X"}) == "dataframe"
        assert classify_node_type(
            "x", {"plugin_class": "DataFramePlugin"}) == "dataframe"
        assert classify_node_type(
            "x", {"plugin_class": "X", "dtype": "pandas.DataFrame"}
        ) == "dataframe"

    def test_grouped_by_keywords(self):
        assert classify_node_type(
            "df_events", {"plugin_class": "GroupedEventsPlugin"}) == "grouped"
        assert classify_node_type(
            "hit_merged", {"plugin_class": "X"}) == "grouped"
        assert classify_node_type(
            "df_paired", {"plugin_class": "X"}) == "grouped"

    def test_side_effect(self):
        assert classify_node_type(
            "out", {"plugin_class": "ParquetExportPlugin"}) == "side_effect"

    def test_structured_array_by_multifield_dtype(self):
        dtype = "[('time', '<i8'), ('height', '<f4')]"
        assert classify_node_type(
            "hit", {"plugin_class": "X", "dtype": dtype}
        ) == "structured_array"

    def test_default_intermediate(self):
        assert classify_node_type("x", {"plugin_class": "Thing"}) \
            == "intermediate"


class TestWireStyles:
    def test_edge_categories(self):
        assert classify_edge_category("pandas.DataFrame") == "dataframe"
        assert classify_edge_category("[('t','<i8')]") == "structured"
        assert classify_edge_category("ndarray") == "array"
        assert classify_edge_category("List[ndarray]") == "list_array"
        assert classify_edge_category("") == "unknown"

    def test_category_style_applied(self):
        style = LineageStyle()
        s = resolve_wire_style("a", "b", "pandas.DataFrame", style)
        assert s["color"] == style.wire_style_by_category["dataframe"]["color"]

    def test_override_beats_category(self):
        style = LineageStyle(
            wire_style_overrides={"hit": {"color": "#123456", "dash": "dot"}}
        )
        s = resolve_wire_style("hit", "df", "ndarray", style)
        assert s["color"] == "#123456" and s["dash"] == "dot"

    def test_unknown_dtype_falls_back(self):
        s = resolve_wire_style("a", "b", "", LineageStyle())
        assert s["color"]  # some color resolved


class TestTextFitting:
    def test_wrap_truncates_with_ellipsis(self):
        lines = wrap_text_lines("one two three four five six seven", 8, 2)
        assert len(lines) == 2 and lines[-1].endswith("...")

    def test_node_text_grows_with_verbose(self):
        details = {"plugin_class": "SomePlugin",
                   "description": "does things to waveforms",
                   "config": {"a": 1, "b": 2}}
        n0 = len(node_text_lines("x", details, LineageStyle(verbose=0)))
        n1 = len(node_text_lines("x", details, LineageStyle(verbose=1)))
        n2 = len(node_text_lines("x", details, LineageStyle(verbose=2)))
        assert n0 == 0 < n1 < n2

    def test_config_lines_capped(self):
        details = {"plugin_class": "P",
                   "config": {f"k{i}": i for i in range(20)}}
        style = LineageStyle(verbose=2, max_config_lines=3)
        lines = node_text_lines("x", details, style)
        assert "..." in lines

    def test_height_grows_with_text(self):
        style = LineageStyle(verbose=2)
        small = estimate_node_height("x", {"plugin_class": "P"}, style)
        big = estimate_node_height(
            "x", {"plugin_class": "P",
                  "description": "long " * 20,
                  "config": {f"k{i}": i for i in range(5)}}, style)
        assert big > small


class TestLayoutAndRouting:
    def test_barycenter_reduces_crossings(self):
        # two parents, two children; natural sorted order crosses wires
        edges = [("a", "z2"), ("b", "z1")]
        by_level = {0: ["a", "b"], 1: ["z1", "z2"]}
        ordered = order_layers(by_level, edges)
        ia, ib = ordered[0].index("a"), ordered[0].index("b")
        i1, i2 = ordered[1].index("z1"), ordered[1].index("z2")
        # parents and children end in matching row order (no crossing)
        assert (ia < ib) == (i2 < i1)

    def test_route_is_orthogonal(self):
        path = route_edge((0, 0), (4, 2), [], set())
        assert path is not None
        for (x1, y1), (x2, y2) in zip(path[:-1], path[1:]):
            assert x1 == x2 or y1 == y2

    def test_route_avoids_obstacle(self):
        box = {"id": "mid", "x_min": 1.5, "x_max": 2.5,
               "y_min": -0.5, "y_max": 0.5}
        path = route_edge((0, 0), (4, 0), [box], set())
        assert path is not None
        for a, b in zip(path[:-1], path[1:]):
            from waveformanalysis_tpu.utils.visualization import (
                _segment_hits_box,
            )
            assert not _segment_hits_box(a, b, box)

    def test_route_none_when_blocked(self):
        # wall of boxes covering every candidate corridor
        boxes = [{"id": f"w{i}", "x_min": 0.05 + 0.39 * i,
                  "x_max": 0.44 + 0.39 * i,
                  "y_min": -50, "y_max": 50} for i in range(10)]
        path = route_edge((0, 0), (4, 0), boxes, set())
        assert path is None  # renderer falls back to an arc


class TestInteractiveHelpers:
    def test_upstream_transitive(self):
        edges = [("a", "b"), ("b", "c"), ("x", "c")]
        assert upstream_nodes(edges, "c") == {"a", "b", "x"}
        assert upstream_nodes(edges, "a") == set()

    def test_format_node_info_verbose(self):
        txt = format_node_info("hit", {
            "plugin_class": "HitFinderPlugin", "version": "2.0.0",
            "config": {"height": 30}, "description": "finds peaks"},
            verbose=2)
        assert "hit" in txt and "HitFinderPlugin" in txt
        assert "height = 30" in txt and "finds peaks" in txt

    def test_interactive_attaches_handlers(self):
        a = {"plugin_class": "A", "depends_on": {}}
        lin = {"plugin_class": "T", "depends_on": {"a": a}}
        ax = plot_lineage_labview(lin, "t", interactive=True)
        assert hasattr(ax, "_wfa_interactive")
        on_hover, on_click, annot = ax._wfa_interactive

        class Ev:
            inaxes = ax
            xdata, ydata = 1e9, 1e9  # miss all nodes

        on_hover(Ev())
        assert not annot.get_visible()
        on_click(Ev())  # miss resets highlight without error


class TestRendererDepth:
    def _lineage(self):
        a = {"plugin_class": "RawFilesPlugin", "depends_on": {}}
        b = {"plugin_class": "HitFinderPlugin", "plugin_version": "2",
             "config": {"height": 30}, "depends_on": {"a": a}}
        return {"plugin_class": "DataFramePlugin", "depends_on": {"b": b}}

    def test_verbose_adds_body_text(self):
        ax0 = plot_lineage_labview(self._lineage(), "df", verbose=0)
        n0 = len(ax0.texts)
        plt.close("all")
        ax2 = plot_lineage_labview(self._lineage(), "df", verbose=2)
        assert len(ax2.texts) > n0

    def test_node_types_get_distinct_colors(self):
        ax = plot_lineage_labview(self._lineage(), "df")
        faces = {p.get_facecolor() for p in ax.patches
                 if hasattr(p, "get_facecolor")}
        assert len(faces) >= 3  # raw_data vs dataframe vs intermediate

    def test_parallel_group_highlight(self):
        class FakeAnalysis:
            critical_path = []
            bottlenecks = []
            parallel_groups = [["a", "b"]]

        ax = plot_lineage_labview(
            self._lineage(), "df", analysis_result=FakeAnalysis(),
            highlight_parallel_groups=True)
        assert ax is not None

    def test_legend_flag(self):
        ax = plot_lineage_labview(self._lineage(), "df",
                                  style=LineageStyle(show_legend=True))
        assert ax.get_legend() is not None

    def test_context_passthrough_enriches_dtype(self, tmp_path):
        class A(Plugin):
            provides = "viz_feat_a"
            output_dtype = np.dtype([("v", "i4")])

            def compute(self, context, run_id, **kwargs):
                return np.zeros(1, dtype=self.output_dtype)

        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(A())
        ax = ctx.plot_lineage("viz_feat_a", verbose=2, interactive=True)
        assert ax is not None


class TestChannelSelectors:
    def test_forms(self):
        assert _parse_channel_selector(HardwareChannel(1, 3)) == (1, 3)
        assert _parse_channel_selector((2, 5)) == (2, 5)
        assert _parse_channel_selector(4) == (0, 4)
        assert _parse_channel_selector("b1c7") == (1, 7)
        assert _parse_channel_selector("2:3") == (2, 3)
        assert _parse_channel_selector("ch6") == (0, 6)

    def test_invalid(self):
        with pytest.raises(ValueError):
            _parse_channel_selector(object())


def _structured_waves(n=8, length=64, channels=(0, 1)):
    dt = np.dtype([("wave", "i2", (length,)), ("baseline", "f8"),
                   ("board", "i2"), ("channel", "i2"),
                   ("record_id", "i8"), ("event_length", "i4")])
    out = np.zeros(n, dtype=dt)
    rng = np.random.default_rng(0)
    out["wave"] = 1000 + rng.integers(-3, 3, (n, length))
    out["wave"][:, 30:34] -= 200  # a dip = a peak for negative polarity
    out["baseline"] = 1000.0
    out["channel"] = np.resize(np.asarray(channels, np.int16), n)
    out["record_id"] = np.arange(n)
    out["event_length"] = length
    return out


class TestWaveformViewer:
    def test_structured_mode_subplots_per_channel(self):
        fig = plot_waveforms(_structured_waves(), event_index=0)
        assert len(fig.axes) == 2  # channels 0 and 1

    def test_channels_filter(self):
        fig = plot_waveforms(_structured_waves(), event_index=0,
                             channels=[(0, 1)])
        assert len(fig.axes) == 1

    def test_hits_drawn_for_matching_record(self):
        waves = _structured_waves(channels=(0,))
        hits = np.zeros(1, dtype=[("position", "i8"), ("height", "f4"),
                                  ("edge_start", "f4"), ("edge_end", "f4"),
                                  ("board", "i2"), ("channel", "i2"),
                                  ("record_id", "i8")])
        hits["position"] = 31
        hits["edge_start"], hits["edge_end"] = 29.0, 34.0
        hits["record_id"] = 0
        fig = plot_waveforms(waves, hits=hits, event_index=0)
        ax = fig.axes[0]
        # wave line + marker line, plus the axvspan patch
        assert len(ax.lines) >= 2
        assert any(p.get_alpha() == 0.15 for p in ax.patches)

    def test_event_index_out_of_range_is_graceful(self):
        fig = plot_waveforms(_structured_waves(n=2, channels=(0,)),
                             event_index=99)
        assert "no event" in fig.axes[0].texts[0].get_text()

    def test_flat_mode_unchanged(self):
        ax = plot_waveforms(np.zeros((4, 16)), max_events=3)
        assert len(ax.lines) == 3


class TestBrowser:
    def test_browse_closure(self, tmp_path):
        from waveformanalysis_tpu.plugins.builtin.peak_finding import (
            HitFinderPlugin,
        )
        from waveformanalysis_tpu.testing.fixtures import (
            make_fake_st_waveforms,
        )

        st = make_fake_st_waveforms(n_events=16, wave_length=64,
                                    pulse_height=200, polarity="positive",
                                    noise_rms=2.0, seed=7)
        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(HitFinderPlugin())
        ctx.inject_data("r", "st_waveforms", st)
        browse = create_interactive_browser(ctx, "r")
        fig = browse(event_index=1)
        assert fig is not None
        ctx.flush_saves()
