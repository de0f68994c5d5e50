"""Property-based chunk time-algebra invariants (hypothesis).

Reference analog: the chunk-utils invariants the streaming engine relies on
(core/processing/chunk.py:262-1341). Randomized inputs pin the laws the
unit tests in test_chunk.py only spot-check:

- split/merge round-trips preserve every row and global time order;
- rechunk never splits a time tie across chunks' MAIN windows and tiles
  without loss for any target size;
- select(a,b) + select(b,c) == select(a,c) for instantaneous rows;
- break segmentation partitions exactly at > threshold gaps.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from waveformanalysis_tpu.dtypes import chunk as C
from waveformanalysis_tpu.dtypes.table import Table


def _tbl(times):
    times = np.asarray(sorted(times), dtype=np.int64)
    return Table({
        "time": times,
        "value": np.arange(len(times), dtype=np.int64),
    })


times_strategy = st.lists(
    st.integers(min_value=0, max_value=10**12), min_size=1, max_size=200,
)


class TestSplitMergeRoundTrip:
    @settings(max_examples=40, deadline=None)
    @given(times=times_strategy, size=st.integers(1, 50))
    def test_split_by_count_preserves_rows(self, times, size):
        tbl = _tbl(times)
        parts = [d for d, _info in C.split_by_count(tbl, size)]
        assert all(len(p) <= size for p in parts)
        merged = C._concat(parts)
        np.testing.assert_array_equal(
            np.asarray(merged["time"]), np.asarray(tbl["time"])
        )
        np.testing.assert_array_equal(
            np.asarray(merged["value"]), np.asarray(tbl["value"])
        )

    @settings(max_examples=40, deadline=None)
    @given(times=times_strategy, size=st.integers(1, 50))
    def test_rechunk_round_trip(self, times, size):
        tbl = _tbl(times)
        chunks = C.split_by_count(tbl, max(1, size // 2) or 1)
        parts = [d for d, _info in C.rechunk(chunks, target_size=size)]
        merged = C.concat_sorted(parts)
        np.testing.assert_array_equal(
            np.asarray(merged["time"]), np.asarray(tbl["time"])
        )


class TestSelectComposition:
    @settings(max_examples=40, deadline=None)
    @given(
        times=times_strategy,
        cuts=st.tuples(
            st.integers(0, 10**12), st.integers(0, 10**12),
            st.integers(0, 10**12),
        ),
    )
    def test_select_composes(self, times, cuts):
        # intersect (strict=False) selection is exactly half-open [a, b) for
        # instantaneous rows, so adjacent windows tile without duplication.
        # (strict=True admits a zero-duration row at exactly `end` because
        # its endtime <= end — pinned in test_strict_end_boundary below.)
        a, b, c = sorted(cuts)
        tbl = _tbl(times)
        direct = C.select_time_range(tbl, start=a, end=c, strict=False)
        left = C.select_time_range(tbl, start=a, end=b, strict=False)
        right = C.select_time_range(tbl, start=b, end=c, strict=False)
        combined = C._concat([left, right])
        np.testing.assert_array_equal(
            np.asarray(direct["time"]), np.asarray(combined["time"])
        )

    def test_strict_end_boundary(self):
        tbl = _tbl([10, 20])
        out = C.select_time_range(tbl, start=0, end=20, strict=True)
        # zero-duration row at end is "fully inside" by endtime <= end
        np.testing.assert_array_equal(np.asarray(out["time"]), [10, 20])
        out2 = C.select_time_range(tbl, start=0, end=20, strict=False)
        np.testing.assert_array_equal(np.asarray(out2["time"]), [10])

    @settings(max_examples=40, deadline=None)
    @given(times=times_strategy)
    def test_full_range_select_is_identity(self, times):
        tbl = _tbl(times)
        t = np.asarray(tbl["time"])
        out = C.select_time_range(tbl, start=int(t.min()),
                                  end=int(t.max()) + 1, strict=True)
        np.testing.assert_array_equal(np.asarray(out["time"]), t)


class TestBreakSegmentation:
    @settings(max_examples=40, deadline=None)
    @given(
        times=st.lists(st.integers(0, 10**10), min_size=2, max_size=120),
        threshold=st.integers(1, 10**9),
    )
    def test_breaks_partition_at_gaps(self, times, threshold):
        tbl = _tbl(times)
        t = np.asarray(tbl["time"])
        parts = [d for d, _info in C.split_by_breaks(tbl, break_threshold_ps=threshold)]
        # row conservation + order
        merged = np.concatenate([np.asarray(p["time"]) for p in parts])
        np.testing.assert_array_equal(merged, t)
        # inside a part: no gap exceeds the threshold; between parts: the
        # first element of the next part is > threshold after the last
        for p in parts:
            pt = np.asarray(p["time"])
            if len(pt) > 1:
                assert np.max(np.diff(pt)) <= threshold
        for a, b in zip(parts[:-1], parts[1:]):
            gap = np.asarray(b["time"])[0] - np.asarray(a["time"])[-1]
            assert gap > threshold


class TestEndtimeLaws:
    @settings(max_examples=40, deadline=None)
    @given(
        times=times_strategy,
        lengths=st.integers(1, 1000),
        dt=st.integers(1, 16),
    )
    def test_endtime_monotone_in_length(self, times, lengths, dt):
        n = len(times)
        tbl = Table({
            "time": np.asarray(sorted(times), np.int64),
            "length": np.full(n, lengths, np.int32),
            "dt": np.full(n, dt, np.int32),
        })
        e1 = C.get_endtime(tbl)
        tbl2 = tbl.with_columns(length=np.full(n, lengths + 1, np.int32))
        e2 = C.get_endtime(tbl2)
        assert np.all(np.asarray(e2) > np.asarray(e1))

    @settings(max_examples=40, deadline=None)
    @given(times=times_strategy)
    def test_sort_by_time_idempotent(self, times):
        tbl = _tbl(times)
        once = C.sort_by_time(tbl)
        twice = C.sort_by_time(once)
        np.testing.assert_array_equal(
            np.asarray(once["value"]), np.asarray(twice["value"])
        )
