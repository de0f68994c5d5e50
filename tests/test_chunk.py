"""Chunk time-algebra tests (semantics parity with the reference chunk layer)."""

import numpy as np
import pytest

from waveformanalysis_tpu.dtypes import chunk as C
from waveformanalysis_tpu.dtypes.table import Table


def make_records(times, dt=2, length=10):
    n = len(times)
    arr = np.zeros(
        n,
        dtype=[("time", "i8"), ("dt", "i4"), ("length", "i4"), ("channel", "i2")],
    )
    arr["time"] = times
    arr["dt"] = dt
    arr["length"] = length
    return arr


class TestEndtime:
    def test_compute_endtime(self):
        arr = make_records([0, 100, 200], dt=2, length=10)
        et = C.compute_endtime(arr)
        np.testing.assert_array_equal(et, [20, 120, 220])

    def test_fixed_dt_override(self):
        arr = make_records([0, 100], dt=2, length=10)
        et = C.compute_endtime(arr, dt=5)
        np.testing.assert_array_equal(et, [50, 150])

    def test_time_field_fallback_to_timestamp(self):
        arr = np.zeros(2, dtype=[("timestamp", "i8"), ("dt", "i4"), ("event_length", "i4")])
        arr["timestamp"] = [10, 20]
        arr["dt"] = 1
        arr["event_length"] = 5
        et = C.compute_endtime(arr)
        np.testing.assert_array_equal(et, [15, 25])

    def test_get_endtime_instantaneous_without_length(self):
        arr = np.zeros(2, dtype=[("time", "i8")])
        arr["time"] = [5, 9]
        np.testing.assert_array_equal(C.get_endtime(arr), [5, 9])

    def test_add_endtime_field(self):
        arr = make_records([0, 50])
        out = C.add_endtime_field(arr)
        assert "endtime" in out.dtype.names
        np.testing.assert_array_equal(out["endtime"], C.compute_endtime(arr))

    def test_works_on_table(self):
        tbl = Table({
            "time": np.array([0, 100], dtype=np.int64),
            "dt": np.array([2, 2], dtype=np.int32),
            "length": np.array([10, 10], dtype=np.int32),
        })
        np.testing.assert_array_equal(C.compute_endtime(tbl), [20, 120])
        out = C.add_endtime_field(tbl)
        assert "endtime" in out


class TestChecks:
    def test_monotonic(self):
        assert C.check_monotonic(make_records([0, 1, 2])).is_valid
        assert not C.check_monotonic(make_records([0, 2, 1])).is_valid
        assert C.check_monotonic(make_records([0, 0, 1])).is_valid
        assert not C.check_monotonic(make_records([0, 0, 1]), strict=True).is_valid

    def test_overlap(self):
        ok = make_records([0, 100], dt=2, length=10)
        assert C.check_overlap(ok).is_valid
        bad = make_records([0, 10], dt=2, length=10)  # endtime 20 > 10
        assert not C.check_overlap(bad).is_valid

    def test_chunk_boundaries(self):
        arr = make_records([10, 50], dt=1, length=10)
        assert C.check_chunk_boundaries(arr, 0, 100).is_valid
        res = C.check_chunk_boundaries(arr, 20, 100)
        assert not res.is_valid
        assert res.stats["n_before_start"] == 1


class TestSelection:
    def test_select_intersect_vs_strict(self):
        arr = make_records([0, 100, 200], dt=2, length=10)  # ends 20,120,220
        out = C.select_time_range(arr, start=15, end=205)
        np.testing.assert_array_equal(out["time"], [0, 100, 200])
        out_strict = C.select_time_range(arr, start=15, end=205, strict=True)
        np.testing.assert_array_equal(out_strict["time"], [100])

    def test_clip_adjusts_time_and_length(self):
        arr = make_records([0, 100], dt=2, length=10)  # ends 20, 120
        out = C.clip_to_time_range(arr, start=10, end=110)
        # first record: skip ceil((10-0)/2)=5 samples -> time 10, length 5
        assert out["time"][0] == 10 and out["length"][0] == 5
        # second record clipped at end: length (110-100)//2 = 5
        assert out["time"][1] == 100 and out["length"][1] == 5

    def test_clip_drops_empty(self):
        arr = make_records([0, 100], dt=2, length=10)
        out = C.clip_to_time_range(arr, start=95, end=130)
        np.testing.assert_array_equal(out["time"], [100])


class TestSplitting:
    def test_split_by_count(self):
        arr = make_records(np.arange(10) * 100)
        chunks = list(C.split_by_count(arr, chunk_size=4))
        assert [info.n_records for _, info in chunks] == [4, 4, 2]
        assert chunks[0][1].chunk_i == 0

    def test_split_by_breaks(self):
        # gap between record 2 and 3 is big
        times = [0, 100, 200, 10_000_000_000_000_000, 10_000_000_000_000_100]
        arr = make_records(times, dt=1, length=10)
        chunks = list(C.split_by_breaks(arr, break_threshold_ps=1_000_000))
        assert len(chunks) == 2
        assert chunks[0][1].n_records == 3
        assert chunks[1][1].n_records == 2

    def test_split_by_time(self):
        arr = make_records([0, 100, 200, 300], dt=1, length=10)
        chunks = list(C.split_by_time(arr, chunk_duration_ns=200))
        assert len(chunks) == 2
        assert chunks[0][1].n_records == 2

    def test_find_break_indices(self):
        times = [0, 100, 5_000_000_000_000_000]
        arr = make_records(times, dt=1, length=10)
        idx = C.find_break_indices(arr, break_threshold_ps=1_000)
        np.testing.assert_array_equal(idx, [0, 2])


class TestMergeRechunk:
    def test_merge_chunks_sorts(self):
        a = make_records([200, 300])
        b = make_records([0, 100])
        merged = C.merge_chunks([a, b])
        np.testing.assert_array_equal(merged["time"], [0, 100, 200, 300])

    def test_rechunk_targets_size(self):
        src = [make_records(np.arange(3) * 1000 + i * 100000) for i in range(5)]
        stream = ((d, C.ChunkInfo(n_records=len(d))) for d in src)
        out = list(C.rechunk(stream, target_size=6))
        sizes = [info.n_records for _, info in out]
        assert sum(sizes) == 15
        assert sizes[0] >= 6

    def test_rechunk_to_boundaries(self):
        arr = make_records([0, 100, 200, 300], dt=1, length=10)
        stream = iter([(arr, C.ChunkInfo())])
        out = list(C.rechunk_to_boundaries(stream, np.array([150])))
        assert len(out) == 2
        np.testing.assert_array_equal(out[0][0]["time"], [0, 100])
        np.testing.assert_array_equal(out[1][0]["time"], [200, 300])

    def test_continuity_check(self):
        chunks = [
            (None, C.ChunkInfo(start_time=0, end_time=100)),
            (None, C.ChunkInfo(start_time=100, end_time=200)),
        ]
        assert C.check_chunk_continuity(chunks).is_valid
        overlapping = [
            (None, C.ChunkInfo(start_time=0, end_time=150)),
            (None, C.ChunkInfo(start_time=100, end_time=200)),
        ]
        assert not C.check_chunk_continuity(overlapping).is_valid


class TestChunkObject:
    def test_boundary_validation(self):
        arr = make_records([10, 50], dt=1, length=10)
        ch = C.Chunk(arr, start=0, end=100, run_id="r")
        assert len(ch) == 2
        assert ch.duration == 100
        with pytest.raises(ValueError):
            C.Chunk(arr, start=20, end=100)
        with pytest.raises(ValueError):
            C.Chunk(arr, start=0, end=55)

    def test_split(self):
        arr = make_records([10, 50], dt=1, length=10)
        ch = C.Chunk(arr, start=0, end=100)
        left, right = ch.split(40)
        assert len(left) == 1 and len(right) == 1
        assert left.end == 40 and right.start == 40


def test_select_time_range_keeps_point_rows_on_window_start():
    """Zero-duration rows (no length/dt fields -> endtime == time) sitting
    exactly at the window start must be selected — regression: the interval
    test (endtime > start) alone dropped the first row of every streamed
    chunk for point-event tables."""
    from waveformanalysis_tpu.dtypes.table import Table

    tbl = Table({"time": np.array([100, 200, 300], dtype=np.int64),
                 "value": np.arange(3.0)})
    out = C.select_time_range(tbl, start=200, end=400)
    np.testing.assert_array_equal(np.asarray(out["time"]), [200, 300])
