"""Cache statistics: analyzer snapshots, hit/miss bookkeeping, CLI surface.

Behavioral analog of the reference cache-statistics suite
(reference: tests/test_cache_statistics.py over
core/storage/cache_statistics.py): a populated storage yields
reference-shaped totals / by_run / by_data_type breakdowns,
largest/oldest/newest entries, human sizes; the runtime hit/miss tracker
feeds Context-level reporting.
"""

import time
from datetime import datetime, timedelta, timezone

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.storage.cache_ops import (
    CacheAnalyzer,
    CacheStatistics,
    CacheStatsSnapshot,
    human_size,
)


@pytest.fixture
def populated_ctx(tmp_path):
    """Storage populated with the reference test's data shape:
    (run, data_name, n_rows) entries across three runs."""
    ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    storage = ctx.storage
    layout = [
        ("run_001", "peaks", 100),
        ("run_001", "waveforms", 500),
        ("run_002", "peaks", 200),
        ("run_002", "waveforms", 1000),
        ("run_003", "hits", 300),
    ]
    rng = np.random.default_rng(0)
    for run_id, data_name, size in layout:
        key = f"{run_id}-{data_name}-abc123"
        data = np.zeros(size, dtype=[("time", "<f8"), ("value", "<f4")])
        storage.save_memmap(key, data, run_id=run_id)
        meta = storage.get_metadata(key, run_id)
        assert meta is not None
        age_s = int(rng.integers(3600, 7 * 24 * 3600))
        meta["created_at"] = (
            datetime.now(timezone.utc) - timedelta(seconds=age_s)
        ).isoformat()
        storage.save_metadata(key, meta, run_id=run_id)
    return ctx


class TestSnapshotDataclass:
    def test_create_and_human_size(self):
        snap = CacheStatsSnapshot(
            total_runs=3, total_entries=10,
            total_size_bytes=1024 * 1024, compressed_entries=2,
            avg_entry_size_bytes=102400.0, largest_entry=None,
            oldest_entry=None, newest_entry=None, by_run={}, by_data_type={},
        )
        assert snap.total_runs == 3
        assert "MB" in snap.total_size_human or "KB" in snap.total_size_human
        assert snap.compression_ratio == pytest.approx(0.2)

    def test_zero_entries_no_division_error(self):
        snap = CacheStatsSnapshot(
            total_runs=0, total_entries=0, total_size_bytes=0,
            compressed_entries=0, avg_entry_size_bytes=0.0,
            largest_entry=None, oldest_entry=None, newest_entry=None,
            by_run={}, by_data_type={},
        )
        assert snap.compression_ratio == 0.0
        assert snap.to_dict()["largest_entry"] is None

    def test_human_size_scales(self):
        assert human_size(512) == "512.0 B"
        assert human_size(2048) == "2.0 KB"
        assert human_size(3 * 1024 ** 2) == "3.0 MB"
        assert human_size(7 * 1024 ** 4) == "7.0 TB"


class TestAnalyzerStatistics:
    def test_totals(self, populated_ctx):
        snap = CacheAnalyzer(populated_ctx.storage).statistics()
        assert snap.total_runs == 3
        assert snap.total_entries == 5
        assert snap.total_size_bytes > 0
        assert snap.avg_entry_size_bytes == pytest.approx(
            snap.total_size_bytes / 5
        )

    def test_by_run_breakdown(self, populated_ctx):
        snap = CacheAnalyzer(populated_ctx.storage).statistics()
        assert set(snap.by_run) == {"run_001", "run_002", "run_003"}
        assert snap.by_run["run_001"]["entries"] == 2
        assert snap.by_run["run_003"]["entries"] == 1
        assert sum(r["bytes"] for r in snap.by_run.values()) == \
            snap.total_size_bytes

    def test_by_data_type_breakdown(self, populated_ctx):
        snap = CacheAnalyzer(populated_ctx.storage).statistics()
        assert set(snap.by_data_type) == {"peaks", "waveforms", "hits"}
        assert snap.by_data_type["peaks"]["entries"] == 2
        assert snap.by_data_type["waveforms"]["bytes"] > \
            snap.by_data_type["peaks"]["bytes"]

    def test_largest_oldest_newest(self, populated_ctx):
        snap = CacheAnalyzer(populated_ctx.storage).statistics()
        assert snap.largest_entry is not None
        # the 1000-row waveforms entry is the largest
        assert snap.largest_entry.key == "run_002-waveforms-abc123"
        assert snap.oldest_entry.age_s >= snap.newest_entry.age_s

    def test_single_run_filter(self, populated_ctx):
        snap = CacheAnalyzer(populated_ctx.storage).statistics("run_001")
        assert snap.total_runs == 1
        assert snap.total_entries == 2
        assert set(snap.by_data_type) == {"peaks", "waveforms"}

    def test_to_dict_serializable(self, populated_ctx):
        import json

        snap = CacheAnalyzer(populated_ctx.storage).statistics()
        payload = json.loads(json.dumps(snap.to_dict()))
        assert payload["total_entries"] == 5
        assert payload["largest_entry"]["key"] == "run_002-waveforms-abc123"

    def test_empty_storage(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path / "empty"),
                      config={"show_progress": False})
        snap = CacheAnalyzer(ctx.storage).statistics()
        assert snap.total_entries == 0
        assert snap.largest_entry is None


class TestHitMissTracking:
    def test_counters_and_rate(self):
        stats = CacheStatistics()
        stats.record_hit("memory")
        stats.record_hit("disk")
        stats.record_miss()
        stats.record_save()
        assert stats.hit_rate == pytest.approx(2 / 3)
        d = stats.to_dict()
        assert d["memory_hits"] == 1 and d["disk_hits"] == 1
        assert d["misses"] == 1 and d["saves"] == 1
        assert d["uptime_s"] >= 0

    def test_reset(self):
        stats = CacheStatistics()
        stats.record_miss()
        stats.reset()
        assert stats.hit_rate == 0.0
        assert stats.to_dict()["misses"] == 0

    def test_merge_runtime(self):
        stats = CacheStatistics()
        stats.merge_runtime({"memory_hits": 3, "disk_hits": 1, "misses": 4})
        assert stats.hit_rate == pytest.approx(0.5)

    def test_context_runtime_cache_feeds_stats(self, tmp_path):
        """Computing twice through a Context produces one miss then one
        memory hit in the runtime cache manager's counters."""
        from waveformanalysis_tpu.dtypes.schema import Field, Schema
        from waveformanalysis_tpu.dtypes.table import Table
        from waveformanalysis_tpu.plugins.base import Plugin

        schema = Schema("d", (Field("v", "i4"),))

        class P(Plugin):
            provides = "d"
            save_when = "always"
            output_dtype = schema

            def compute(self, context, run_id, **kwargs):
                return Table({"v": np.arange(3, dtype=np.int32)},
                             schema=schema)

        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(P())
        ctx.get_data("r", "d")
        ctx.get_data("r", "d")
        rt = ctx._cache_manager.get_stats()
        assert rt["memory_hits"] >= 1
        merged = CacheStatistics()
        merged.merge_runtime(rt)
        assert merged.hit_rate > 0
