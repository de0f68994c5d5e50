"""Data services tests: query engine, time domain, cache ops, export,
dependency analysis, function cache, cache CLI."""

import json
from datetime import datetime, timezone

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.data.dependency_analysis import DependencyAnalyzer
from waveformanalysis_tpu.data.export import DataExporter
from waveformanalysis_tpu.data.query import TimeIndex, TimeRangeQueryEngine
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.base import Option, Plugin
from waveformanalysis_tpu.storage.cache_ops import (
    CacheAnalyzer,
    CacheCleaner,
    CacheDiagnostics,
    CacheStatistics,
)
from waveformanalysis_tpu.storage.function_cache import CacheManager
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms, make_tiny_context


def make_timed_table(times, lengths=10, dt=2, channels=None):
    n = len(times)
    return Table({
        "time": np.asarray(times, np.int64),
        "dt": np.full(n, dt, np.int32),
        "length": np.full(n, lengths, np.int32),
        "channel": np.asarray(channels if channels is not None
                              else np.zeros(n), np.int16),
        "v": np.arange(n, dtype=np.float64),
    })


class TestTimeIndex:
    def test_overlap_query(self):
        tbl = make_timed_table([0, 100, 200, 300])  # each 20 long
        idx = TimeIndex.build(tbl)
        rows = idx.query(105, 250)
        np.testing.assert_array_equal(np.sort(rows), [1, 2])
        # record 1 ends at 120 > 105 -> included even though time 100 < 105
        rows2 = idx.query(110, 150)
        np.testing.assert_array_equal(rows2, [1])

    def test_unsorted_input(self):
        tbl = make_timed_table([300, 0, 200, 100])
        idx = TimeIndex.build(tbl)
        rows = idx.query(None, 150)
        np.testing.assert_array_equal(np.sort(rows), [1, 3])


class TestQueryEngineAndTimeDomain:
    @pytest.fixture
    def qctx(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        tbl = make_timed_table(np.arange(10) * 100,
                               channels=np.arange(10) % 2)
        ctx.inject_data("r", "records_like", tbl)
        return ctx

    def test_time_range(self, qctx):
        qctx.set_config({"time_domain": "system_ns"})
        out = qctx.time_range("r", "records_like", start=150, end=450)
        times = np.asarray(out["time"])
        assert times.min() >= 100 and times.max() <= 400

    def test_channel_filtered(self, qctx):
        qctx.set_config({"time_domain": "system_ns"})
        by_ch = qctx.query_multi_channel_time_range("r", "records_like",
                                                    start=0, end=1000)
        assert sorted(by_ch) == [0, 1]
        assert all(np.all(np.asarray(v["channel"]) == ch)
                   for ch, v in by_ch.items())

    def test_absolute_query_via_epoch(self, qctx):
        qctx.set_config({"time_domain": "system_ns"})
        epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)
        qctx.set_epoch("r", epoch)
        out = qctx.time_range_absolute(
            "r", "records_like",
            start_dt=epoch, end_dt=datetime(2024, 1, 1, 0, 0, 0, 1,
                                            tzinfo=timezone.utc),
        )
        assert len(out) > 0  # 1 microsecond window covers 0..1000ns times

    def test_missing_epoch_raises(self, qctx):
        with pytest.raises(ValueError, match="epoch"):
            qctx.time_range_absolute("r", "records_like",
                                     start_dt=datetime(2024, 1, 1))

    def test_bad_time_domain(self, qctx):
        qctx.set_config({"time_domain": "fortnights"})
        with pytest.raises(ValueError, match="time_domain"):
            qctx.time_range("r", "records_like", 0, 10)


class SimpleSource(Plugin):
    provides = "src"
    save_when = "always"
    version = "1.0"

    def compute(self, context, run_id, **kwargs):
        arr = np.zeros(5, dtype=[("time", "i8"), ("v", "f8")])
        arr["time"] = np.arange(5)
        return arr


class SimpleSink(Plugin):
    provides = "sink"
    depends_on = ["src"]
    save_when = "always"
    version = "1.0"

    def compute(self, context, run_id, **kwargs):
        return np.array(context.get_data(run_id, "src"), copy=True)


class TestCacheOps:
    @pytest.fixture
    def populated(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path / "s"),
                      config={"show_progress": False})
        ctx.register(SimpleSource(), SimpleSink())
        ctx.get_data("runX", "sink")
        ctx.get_data("runY", "src")
        ctx.flush_saves()  # cache-ops tools inspect the files directly
        return ctx

    def test_analyzer(self, populated):
        analyzer = CacheAnalyzer(populated.storage)
        assert sorted(analyzer.list_runs()) == ["runX", "runY"]
        entries = analyzer.scan()
        assert len(entries) == 3
        assert all(e.has_lineage for e in entries)
        s = analyzer.summary()
        assert s["n_entries"] == 3 and s["total_bytes"] > 0
        assert "Cache: 3 entries" in analyzer.report()

    def test_context_facades(self, populated):
        report = populated.analyze_cache("runX")
        assert report["summary"]["n_entries"] == 2
        diag = populated.diagnose_cache()
        assert diag["is_healthy"]
        stats = populated.cache_stats()
        assert stats["misses"] >= 3

    def test_cleaner_by_age(self, populated):
        cleaner = CacheCleaner(populated.storage)
        plan = cleaner.plan(max_age_s=0.0)  # everything is "old"
        assert len(plan.to_delete) == 3
        assert cleaner.execute(plan, dry_run=True) == 3
        assert cleaner.execute(plan) == 3
        assert CacheAnalyzer(populated.storage).scan() == []

    def test_cleaner_all_versions_match(self, populated):
        cleaner = CacheCleaner(populated.storage)
        plan = cleaner.plan(storage_version="1.0.0")
        assert plan.to_delete == []  # everything matches
        plan2 = cleaner.plan(storage_version="9.9.9")
        assert len(plan2.to_delete) == 3

    def test_diagnostics_detects_orphan(self, populated, tmp_path):
        d = tmp_path / "s" / "runX" / "_cache"
        (d / "orphan.bin").write_bytes(b"junk")
        report = CacheDiagnostics(populated.storage).diagnose("runX")
        assert "orphan" in report["orphan_payloads"]
        assert not report["is_healthy"]

    def test_statistics(self):
        st = CacheStatistics()
        st.record_hit("memory")
        st.record_hit("disk")
        st.record_miss()
        assert abs(st.hit_rate - 2 / 3) < 1e-9


class TestExport:
    @pytest.fixture
    def ectx(self, tmp_path):
        ctx = make_tiny_context(tmp_path / "store",
                                st_waveforms=make_fake_st_waveforms(6, 16))
        from waveformanalysis_tpu.plugins.builtin.basic_features import (
            BasicFeaturesPlugin,
        )

        ctx.register(BasicFeaturesPlugin())
        return ctx

    @pytest.mark.parametrize("fmt", ["csv", "json", "npy", "npz", "parquet"])
    def test_roundtrip_formats(self, ectx, tmp_path, fmt):
        exporter = DataExporter(ectx)
        path = exporter.export("test_run", "basic_features",
                               tmp_path / f"out.{fmt}")
        assert path.exists() and path.stat().st_size > 0
        if fmt == "npz":
            loaded = np.load(path)
            assert "height" in loaded
        if fmt == "csv":
            import pandas as pd

            df = pd.read_csv(path)
            assert len(df) == 6

    @pytest.mark.parametrize("fmt", ["npy", "npz", "hdf5"])
    def test_dataframe_targets_in_array_formats(self, ectx, tmp_path, fmt):
        # DataFrame data names must export through the structured-array
        # writers too (regression: _to_structured rejected DataFrames)
        from waveformanalysis_tpu.plugins.builtin.dataframe import (
            DataFramePlugin,
        )

        ectx.register(DataFramePlugin())
        path = DataExporter(ectx).export(
            "test_run", "df", tmp_path / f"df_out.{fmt}", fmt=fmt
        )
        assert path.exists() and path.stat().st_size > 0
        if fmt == "npy":
            arr = np.load(path, allow_pickle=True)
            assert len(arr) == 6 and "area" in arr.dtype.names

    def test_batch_export(self, ectx, tmp_path):
        out = DataExporter(ectx).batch_export(
            "test_run", ["basic_features"], tmp_path / "batch", fmt="csv"
        )
        assert out["basic_features"].exists()

    def test_bad_format(self, ectx, tmp_path):
        with pytest.raises(ValueError, match="Unsupported export format"):
            DataExporter(ectx).export("test_run", "basic_features",
                                      tmp_path / "x.xlsx")


class TestDependencyAnalysis:
    def test_analysis(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False},
                      stats_mode="basic")
        ctx.register(SimpleSource(), SimpleSink())
        ctx.get_data("r", "sink")
        result = ctx.analyze_dependencies("sink")
        assert result.plan == ["src", "sink"]
        assert result.levels == [["src"], ["sink"]]
        assert result.critical_path == ["src", "sink"]
        assert result.critical_path_s >= 0
        assert "Dependency analysis" in result.summary()
        md = result.to_markdown()
        assert "## Critical path" in md


class TestFunctionCache:
    def test_memoizes_and_invalidates_on_watch(self, tmp_path):
        calls = {"n": 0}
        mgr = CacheManager(tmp_path / "fcache")
        watched = tmp_path / "input.txt"
        watched.write_text("v1")

        @mgr.cached(watch_files=[watched])
        def expensive(x):
            calls["n"] += 1
            return x * 2

        assert expensive(21) == 42
        assert expensive(21) == 42
        assert calls["n"] == 1  # cached
        import os, time

        time.sleep(0.01)
        watched.write_text("v2-different")
        assert expensive(21) == 42
        assert calls["n"] == 2  # invalidated by watch signature

    def test_clear(self, tmp_path):
        mgr = CacheManager(tmp_path / "fc")

        @mgr.cached()
        def f(x):
            return x

        f(1)
        assert mgr.clear() >= 1


class TestCacheCLI:
    def test_info_list_diagnose_clean(self, tmp_path, capsys):
        ctx = Context(storage_dir=str(tmp_path / "s"),
                      config={"show_progress": False})
        ctx.register(SimpleSource())
        ctx.get_data("r1", "src")
        ctx.flush_saves()  # CLI inspects cache FILES: settle async writes

        from waveformanalysis_tpu.cli_cache import main

        assert main(["--storage-dir", str(tmp_path / "s"), "info"]) == 0
        out = capsys.readouterr().out
        assert "entries: 1" in out

        assert main(["--storage-dir", str(tmp_path / "s"), "list", "--json"]) == 0
        entries = json.loads(capsys.readouterr().out)
        assert len(entries) == 1

        assert main(["--storage-dir", str(tmp_path / "s"), "diagnose"]) == 0

        assert main(["--storage-dir", str(tmp_path / "s"), "clean",
                     "--all", "--yes"]) == 0
        out = capsys.readouterr().out
        assert "deleted 1 entries" in out

    def test_clean_requires_policy(self, tmp_path):
        from waveformanalysis_tpu.cli_cache import main

        assert main(["--storage-dir", str(tmp_path), "clean"]) == 2


class TestCacheAnalysisPlugin:
    def test_plugin(self, tmp_path):
        from waveformanalysis_tpu.plugins.builtin.cache_analysis import (
            CacheAnalysisPlugin,
        )

        ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        ctx.register(SimpleSource(), CacheAnalysisPlugin())
        ctx.get_data("r", "src")
        ctx.flush_saves()  # the analysis plugin scans the cache files
        report = ctx.get_data("r", "cache_analysis")
        assert report["summary"]["n_entries"] == 1
        assert report["diagnostics"]["is_healthy"]
