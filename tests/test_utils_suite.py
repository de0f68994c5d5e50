"""Utils batch tests: loader, hot reload, strax adapters, io, event filters,
preview, visualization, docs generator."""

import textwrap

import numpy as np
import pandas as pd
import pytest

from tests.utils import create_daq_run
from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.adapters import (
    StraxContextAdapter,
    convert_dtype_from_strax,
    convert_dtype_to_strax,
    wrap_strax_plugin,
)
from waveformanalysis_tpu.plugins.base import Plugin
from waveformanalysis_tpu.plugins.hot_reload import enable_hot_reload
from waveformanalysis_tpu.plugins.loader import PluginLoader
from waveformanalysis_tpu.utils import event_filters as EF
from waveformanalysis_tpu.utils.io import count_rows, parse_and_stack_files
from waveformanalysis_tpu.utils.plugin_doc_generator import (
    PluginDocGenerator,
    check_doc_coverage,
)
from waveformanalysis_tpu.utils.preview import WaveformPreviewer


class TestPluginLoader:
    def test_directory_scan(self, tmp_path):
        plugin_dir = tmp_path / "plugins"
        plugin_dir.mkdir()
        (plugin_dir / "my_plugin.py").write_text(textwrap.dedent("""
            import numpy as np
            from waveformanalysis_tpu.plugins.base import Plugin

            class CustomPlugin(Plugin):
                provides = "custom_data"

                def compute(self, context, run_id, **kwargs):
                    return np.zeros(1)
        """))
        (plugin_dir / "broken.py").write_text("this is not python ][")

        loader = PluginLoader()
        found = loader.discover_directory(plugin_dir)
        assert [c.provides for c in found] == ["custom_data"]
        assert len(loader.report.failures) == 1
        assert "broken.py" in loader.report.failures[0].source
        assert "custom_data" in loader.report.summary()

    def test_register_discovered(self, tmp_path):
        plugin_dir = tmp_path / "p"
        plugin_dir.mkdir()
        (plugin_dir / "ok.py").write_text(textwrap.dedent("""
            import numpy as np
            from waveformanalysis_tpu.plugins.base import Plugin

            class P(Plugin):
                provides = "loaded_data"

                def compute(self, context, run_id, **kwargs):
                    return np.zeros(2)
        """))
        loader = PluginLoader()
        loader.discover_directory(plugin_dir)
        ctx = Context(storage_dir=str(tmp_path / "s"),
                      config={"show_progress": False})
        assert loader.register_discovered(ctx) == 1
        assert "loaded_data" in ctx.plugins

    def test_missing_directory(self, tmp_path):
        loader = PluginLoader()
        assert loader.discover_directory(tmp_path / "nope") == []
        assert loader.report.failures


class TestHotReload:
    def test_reload_on_change(self, tmp_path):
        plugin_file = tmp_path / "hot_plugin.py"
        plugin_file.write_text(textwrap.dedent("""
            import numpy as np
            from waveformanalysis_tpu.plugins.base import Plugin

            class HotPlugin(Plugin):
                provides = "hot_data"
                version = "1.0.0"

                def compute(self, context, run_id, **kwargs):
                    return np.zeros(1)
        """))
        loader = PluginLoader()
        (cls,) = loader.discover_directory(tmp_path, pattern="hot_plugin.py")
        ctx = Context(storage_dir=str(tmp_path / "s"),
                      config={"show_progress": False})
        ctx.register(cls())
        assert ctx.get_plugin("hot_data").version == "1.0.0"

        reloader = enable_hot_reload(ctx)
        assert reloader.watch_registered() >= 0
        import time

        time.sleep(0.02)
        plugin_file.write_text(plugin_file.read_text().replace("1.0.0", "2.0.0"))
        changed = reloader.check_and_reload()
        assert changed == ["hot_data"]
        assert ctx.get_plugin("hot_data").version == "2.0.0"
        assert reloader.reload_count == 1


class FakeStraxOption:
    def __init__(self, name, default, help=""):
        self.name = name
        self.default = default
        self.help = help
        self.track = True
        self.type = type(default)


class FakeStraxPlugin:
    """Duck-typed strax plugin."""

    provides = "strax_data"
    depends_on = ("source",)
    __version__ = "0.5.0"
    save_when = None
    dtype = [(("Event time", "time"), "<i8"), (("Signal area", "area"), "<f4")]
    takes_config = {"thresh": FakeStraxOption("thresh", 5.0)}

    def compute(self, source):
        out = np.zeros(len(source), dtype=[("time", "i8"), ("area", "f4")])
        out["time"] = source["time"]
        out["area"] = source["v"] * 2
        return out


class TestStraxAdapters:
    def test_wrap_and_run(self, tmp_path):
        class Source(Plugin):
            provides = "source"
            save_when = "always"

            def compute(self, context, run_id, **kwargs):
                arr = np.zeros(3, dtype=[("time", "i8"), ("v", "f4")])
                arr["time"] = [1, 2, 3]
                arr["v"] = [1.0, 2.0, 3.0]
                return arr

        ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        adapted = wrap_strax_plugin(FakeStraxPlugin)
        assert adapted.provides == "strax_data"
        assert adapted.version == "0.5.0"
        assert "thresh" in adapted.options
        ctx.register(Source(), adapted)
        out = ctx.get_data("r", "strax_data")
        np.testing.assert_array_equal(np.asarray(out["area"]), [2.0, 4.0, 6.0])

    def test_context_facade(self, tmp_path):
        class Source(Plugin):
            provides = "source"

            def compute(self, context, run_id, **kwargs):
                arr = np.zeros(2, dtype=[("time", "i8"), ("v", "f4")])
                return arr

        Source.output_dtype = np.dtype([("time", "i8"), ("v", "f4")])
        ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        ctx.register(Source())
        sctx = StraxContextAdapter(ctx)
        arr = sctx.get_array("r", "source")
        assert arr.dtype.names == ("time", "v")
        df = sctx.get_df("r", "source")
        assert list(df.columns) == ["time", "v"]
        assert "source" in sctx.search_field("time")

    def test_dtype_conversions(self):
        native = np.dtype([("time", "i8"), ("wave", "i2", (8,))])
        strax_descr = convert_dtype_to_strax(native)
        assert strax_descr[0][0] == ("time", "time")
        back = convert_dtype_from_strax(strax_descr)
        assert back == native


class TestIO:
    def test_parse_and_stack(self, tmp_path):
        create_daq_run(tmp_path, run_name="rio", n_channels=2,
                       n_files_per_channel=2, n_rows=4, n_samples=16)
        from waveformanalysis_tpu.formats.adapter import get_adapter

        groups = get_adapter("vx2730").scan_run(str(tmp_path), "rio")
        raw_files = [groups[ch] for ch in sorted(groups)]
        stacked = parse_and_stack_files(raw_files, n_jobs=4)
        assert len(stacked) == 2
        assert stacked[0].shape[0] == 8  # 2 files x 4 rows
        counts = count_rows(raw_files)
        assert counts == [8, 8]

    def test_empty(self):
        assert parse_and_stack_files([[], []]) == [None, None]


class TestEventFilters:
    @pytest.fixture
    def df_events(self):
        return pd.DataFrame({
            "event_id": [0, 1, 2],
            "n_hits": [2, 1, 3],
            "dt/ns": [10.0, 0.0, 500.0],
            "channels": [np.array([0, 1]), np.array([0]), np.array([0, 1, 2])],
            "timestamps": [np.array([0, 10_000]), np.array([5]),
                           np.array([0, 100_000, 500_000])],
            "areas": [np.array([5.0, 5.0]), np.array([1.0]),
                      np.array([10.0, 10.0, 10.0])],
        })

    def test_by_n_hits(self, df_events):
        assert len(EF.filter_by_n_hits(df_events, min_hits=2)) == 2
        assert len(EF.filter_by_n_hits(df_events, min_hits=2, max_hits=2)) == 1

    def test_by_channels(self, df_events):
        assert len(EF.filter_by_channels(df_events, [0, 1])) == 2
        assert len(EF.filter_by_channels(df_events, [0, 1], exact=True)) == 1

    def test_by_time_span(self, df_events):
        assert len(EF.filter_by_time_span(df_events, 100.0)) == 2

    def test_coincidence(self, df_events):
        out = EF.filter_coincidence(df_events, 0, 1, max_dt_ns=50.0)
        assert list(out["event_id"]) == [0]

    def test_by_area(self, df_events):
        out = EF.filter_by_area(df_events, min_total_area=10.0)
        assert list(out["event_id"]) == [0, 2]

    def test_filter_events_by_function_row(self, df_events):
        out = EF.filter_events_by_function(
            df_events, lambda row: row["n_hits"] >= 2)
        assert list(out["event_id"]) == [0, 2]

    def test_filter_events_by_function_column_vectorized(self, df_events):
        out = EF.filter_events_by_function(
            df_events, lambda col: col >= 2, column="n_hits")
        assert list(out["event_id"]) == [0, 2]

    def test_filter_events_by_function_column_scalar_fallback(self, df_events):
        # predicate only works per element -> vectorized try fails, apply wins
        out = EF.filter_events_by_function(
            df_events, lambda v: len(v) == 2, column="channels")
        assert list(out["event_id"]) == [0]

    def test_filter_coincidence_events_reference_name(self, df_events):
        out = EF.filter_coincidence_events(df_events, [0, 1])
        assert list(out["event_id"]) == [0, 2]

    def test_extract_channel_attributes(self, df_events):
        got = EF.extract_channel_attributes(df_events, [0, 2],
                                            attribute="areas")
        assert got[0] == [5.0, 1.0, 10.0]   # first hit on ch0 per event
        assert got[2] == [10.0]              # only event 2 has ch2

    def test_extract_channel_attributes_timestamps(self, df_events):
        got = EF.extract_channel_attributes(df_events, [1],
                                            attribute="timestamps")
        assert got[1] == [10_000, 100_000]


class TestPreview:
    def test_load_and_features(self, tmp_path):
        # pulse sits at absolute column 45 -> sample 38; needs >= 39 samples
        create_daq_run(tmp_path, run_name="rp", n_channels=1, n_rows=10,
                       n_samples=48, pulse_height=150)
        pv = WaveformPreviewer(str(tmp_path), "rp")
        tbl = pv.load_events(channel=0, start=2, n_events=4)
        assert len(tbl) == 4
        feats = pv.preview_features(tbl)
        assert feats["height"].max() > 100
        assert "4 events" in pv.summary(tbl)

    def test_load_by_timestamp(self, tmp_path):
        create_daq_run(tmp_path, run_name="rt", n_channels=1, n_rows=10,
                       n_samples=16)
        pv = WaveformPreviewer(str(tmp_path), "rt")
        tbl = pv.load_by_timestamp(0, start_ps=20_000_000, end_ps=50_000_000)
        ts = np.asarray(tbl["timestamp"])
        assert np.all((ts >= 20_000_000) & (ts < 50_000_000))

    def test_plots_render(self, tmp_path):
        create_daq_run(tmp_path, run_name="rv", n_channels=1, n_rows=6,
                       n_samples=16)
        pv = WaveformPreviewer(str(tmp_path), "rv")
        tbl = pv.load_events(n_events=6)
        ax = pv.plot_overlay(tbl)
        assert ax is not None
        fig = pv.plot_grid(tbl, n_cols=3)
        assert fig is not None


class TestVisualization:
    def test_lineage_graph_and_plot(self, tmp_path):
        from waveformanalysis_tpu.utils.visualization import (
            layered_layout,
            lineage_to_graph,
            plot_lineage_labview,
        )

        lineage = {
            "plugin_class": "Sink", "plugin_version": "1.0",
            "config": {}, "depends_on": {
                "src": {"plugin_class": "Source", "plugin_version": "1.0",
                        "config": {}, "depends_on": {}},
            },
        }
        nodes, edges, info = lineage_to_graph(lineage, "sink")
        assert set(nodes) == {"sink", "src"}
        assert ("src", "sink") in edges
        pos = layered_layout(nodes, edges)
        assert pos["src"][0] < pos["sink"][0]
        ax = plot_lineage_labview(lineage, "sink")
        assert ax is not None


class TestDocsGenerator:
    def test_generate_and_coverage(self, tmp_path):
        from waveformanalysis_tpu.plugins.builtin.basic_features import (
            BasicFeaturesPlugin,
        )

        ctx = Context(storage_dir=str(tmp_path / "s"),
                      config={"show_progress": False})
        ctx.register(BasicFeaturesPlugin())
        gen = PluginDocGenerator(ctx)
        page = gen.render_plugin("basic_features")
        assert "`basic_features`" in page
        assert "height_range" in page
        agent = gen.render_plugin("basic_features", variant="agent")
        assert "spec_hash=" in agent

        written = gen.generate_all(tmp_path / "docs")
        assert (tmp_path / "docs" / "basic_features.md").exists()
        assert (tmp_path / "docs" / "index.md").exists()

        report = check_doc_coverage(ctx, tmp_path / "docs")
        assert report["is_complete"]
        # drift detection
        (tmp_path / "docs" / "basic_features.md").write_text("stale")
        report2 = check_doc_coverage(ctx, tmp_path / "docs")
        assert report2["stale"] == ["basic_features"]

    def test_docs_cli(self, tmp_path, capsys):
        from waveformanalysis_tpu.utils.cli_docs import main

        out_dir = str(tmp_path / "docs")
        assert main(["--out-dir", out_dir, "generate"]) == 0
        assert main(["--out-dir", out_dir, "check"]) == 0
        out = capsys.readouterr().out
        assert "stale: 0" in out and "missing: 0" in out
        assert main(["--out-dir", out_dir, "show", "hit"]) == 0
        assert "`hit`" in capsys.readouterr().out
