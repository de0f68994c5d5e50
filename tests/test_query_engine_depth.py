"""TimeRangeQueryEngine depth: index semantics, LRU cache, invalidation.

Behavioral analog of the reference query layer
(reference: core/data/query.py:34-592): the binary-search TimeIndex honors
endtime overlap (a record straddling the window boundary is selected), the
LRU cache bounds itself and serves repeats, per-(run, data) indexes
invalidate independently, and channel-filtered queries match per-channel
oracles.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.data.query import (
    TimeIndex,
    TimeRangeCache,
    TimeRangeQueryEngine,
)
from waveformanalysis_tpu.dtypes.schema import Field, Schema
from waveformanalysis_tpu.dtypes.table import Table

SCHEMA = Schema(
    "q",
    (
        Field("time", "i8"),
        Field("length", "i4"),
        Field("dt", "i4"),
        Field("channel", "i2"),
        Field("v", "f4"),
    ),
)


def _table(n=50, ch_mod=2, dt=2, length=10, t0=0, spacing=100):
    t = t0 + np.arange(n, dtype=np.int64) * spacing
    return Table(
        {
            "time": t,
            "length": np.full(n, length, np.int32),
            "dt": np.full(n, dt, np.int32),
            "channel": (np.arange(n) % ch_mod).astype(np.int16),
            "v": np.arange(n, dtype=np.float32),
        },
        schema=SCHEMA,
    )


class TestTimeIndex:
    def test_basic_window(self):
        idx = TimeIndex.build(_table())
        sel = idx.query(200, 400)
        # records at t=200,300 start inside; t in [180,200) may overlap via
        # endtime (length*dt=20): the record at 180? none (spacing 100)
        times = np.sort(np.asarray(_table()["time"])[sel])
        assert times.min() >= 200 - 20
        assert times.max() < 400

    def test_endtime_overlap_selected(self):
        # record at t=100 with span 20 overlaps window starting at 110
        idx = TimeIndex.build(_table(spacing=100))
        sel = idx.query(110, 150)
        times = np.asarray(_table()["time"])[sel]
        assert 100 in times  # straddles the left boundary

    def test_open_ended_queries(self):
        t = _table(n=10)
        idx = TimeIndex.build(t)
        assert len(idx.query(None, None)) == 10
        assert len(idx.query(500, None)) == 5 or len(idx.query(500, None)) == 6
        assert len(idx.query(None, 500)) == 5

    def test_empty_table(self):
        idx = TimeIndex.build(Table.zeros(0, SCHEMA))
        assert len(idx.query(0, 100)) == 0


class TestTimeRangeCache:
    def test_lru_eviction(self):
        c = TimeRangeCache(max_entries=2)
        c.put(("a",), 1)
        c.put(("b",), 2)
        assert c.get(("a",)) == 1  # refresh 'a'
        c.put(("c",), 3)           # evicts 'b'
        assert c.get(("b",)) is None
        assert c.get(("a",)) == 1 and c.get(("c",)) == 3

    def test_clear(self):
        c = TimeRangeCache()
        c.put(("x",), 9)
        c.clear()
        assert c.get(("x",)) is None


class TestQueryEngine:
    @pytest.fixture
    def ctx(self, tmp_path):
        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.inject_data("r1", "qdata", _table(n=60))
        ctx.inject_data("r2", "qdata", _table(n=30, t0=10_000))
        return ctx

    def test_query_time_range(self, ctx):
        eng = TimeRangeQueryEngine(ctx)
        out = eng.query_time_range("r1", "qdata", 1000, 2000)
        times = np.asarray(out["time"])
        assert len(times) and times.min() >= 980 and times.max() < 2000

    def test_runs_independent(self, ctx):
        eng = TimeRangeQueryEngine(ctx)
        out1 = eng.query_time_range("r1", "qdata", 0, 500)
        out2 = eng.query_time_range("r2", "qdata", 0, 500)
        assert len(out1) == 5
        assert len(out2) == 0  # r2 starts at t0=10000

    def test_channel_filtered_matches_oracle(self, ctx):
        eng = TimeRangeQueryEngine(ctx)
        by_ch = eng.query_multi_channel_time_range(
            "r1", "qdata", 0, 3000, channels=[0, 1]
        )
        full = _table(n=60)
        t = np.asarray(full["time"])
        ch = np.asarray(full["channel"])
        for c in (0, 1):
            expect = np.sort(t[(ch == c) & (t >= 0) & (t < 3000)])
            got = np.sort(np.asarray(by_ch[c]["time"]))
            np.testing.assert_array_equal(got, expect)

    def test_repeat_query_hits_cache(self, ctx):
        eng = TimeRangeQueryEngine(ctx)
        eng.query_time_range("r1", "qdata", 0, 1000)
        before = eng.cache_stats
        eng.query_time_range("r1", "qdata", 0, 1000)
        after = eng.cache_stats
        assert after.get("hits", 0) > before.get("hits", 0)

    def test_invalidate_run_scoped(self, ctx):
        eng = TimeRangeQueryEngine(ctx)
        eng.query_time_range("r1", "qdata", 0, 1000)
        eng.query_time_range("r2", "qdata", 0, 50_000)
        eng.invalidate(run_id="r1")
        # r1's index is gone; r2's query still serves
        out = eng.query_time_range("r2", "qdata", 0, 50_000)
        assert len(out) == 30
        out1 = eng.query_time_range("r1", "qdata", 0, 1000)  # rebuilds
        assert len(out1) == 10
