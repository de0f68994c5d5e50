"""hit_merge depth: gap/dt/width clustering rules, cross-record windows,
component table consistency (reference analog: hit_merge.py:115-324).
"""

import numpy as np
import pytest

from waveformanalysis_tpu.ops.hit_merge import merge_hits


def _hits(ts, channel=0, dt=2, record_id=None, pos=10.0, es=8, ee=12,
          height=None, integral=None, board=0):
    n = len(ts)
    return {
        "timestamp": np.asarray(ts, np.int64),
        "position": np.full(n, pos, np.float64),
        "height": np.asarray(height if height is not None
                             else np.linspace(1, n, n), np.float32),
        "integral": np.asarray(integral if integral is not None
                               else np.full(n, 10.0), np.float32),
        "edge_start": np.full(n, es, np.float64),
        "edge_end": np.full(n, ee, np.float64),
        "width": np.full(n, float(ee - es), np.float32),
        "dt": np.asarray(dt if np.ndim(dt) else [dt] * n, np.int64),
        "rise_time": np.full(n, 1.0, np.float32),
        "fall_time": np.full(n, 1.0, np.float32),
        "board": np.full(n, board, np.int16),
        "channel": np.asarray(channel if np.ndim(channel) else [channel] * n,
                              np.int16),
        "record_id": np.asarray(
            record_id if record_id is not None else np.arange(n), np.int64),
    }


class TestClusteringRules:
    def test_gap_rule(self):
        # windows are 4 samples * 2 ns = 8 ns wide; spacing 10 ns apart
        # -> 2 ns gaps: merge_gap 3 joins, merge_gap 1 does not
        ts = np.array([0, 10_000, 20_000])
        merged, _, _ = merge_hits(_hits(ts), merge_gap_ns=3.0)
        assert len(merged["timestamp"]) == 1
        merged2, _, _ = merge_hits(_hits(ts), merge_gap_ns=1.0)
        assert len(merged2["timestamp"]) == 3

    def test_zero_gap_disables_merging(self):
        ts = np.array([0, 1, 2])
        merged, _, _ = merge_hits(_hits(ts), merge_gap_ns=0.0)
        assert len(merged["timestamp"]) == 3

    def test_channels_never_merge_across(self):
        ts = np.array([0, 100, 0, 100])
        h = _hits(ts, channel=[0, 0, 1, 1])
        merged, _, _ = merge_hits(h, merge_gap_ns=1e6)
        assert len(merged["timestamp"]) == 2
        assert sorted(merged["channel"]) == [0, 1]

    def test_boards_never_merge_across(self):
        h = _hits(np.array([0, 100]), channel=[3, 3])
        h["board"] = np.array([0, 1], np.int16)
        merged, _, _ = merge_hits(h, merge_gap_ns=1e6)
        assert len(merged["timestamp"]) == 2

    def test_dt_mismatch_blocks_merge(self):
        ts = np.array([0, 10_000])
        h = _hits(ts, dt=[2, 4])
        merged, _, _ = merge_hits(h, merge_gap_ns=1e6)
        assert len(merged["timestamp"]) == 2

    def test_max_total_width_caps_cluster(self):
        # chain of hits each extending the window; cap forces a split
        ts = np.arange(6) * 10_000
        merged_nocap, _, _ = merge_hits(_hits(ts), merge_gap_ns=5.0)
        assert len(merged_nocap["timestamp"]) == 1
        merged_cap, _, _ = merge_hits(
            _hits(ts), merge_gap_ns=5.0, max_total_width_ns=25.0,
        )
        assert len(merged_cap["timestamp"]) > 1


class TestMergedValues:
    def test_anchor_is_highest_hit(self):
        ts = np.array([0, 10_000, 20_000])
        h = _hits(ts, height=[1.0, 9.0, 2.0])
        merged, _, _ = merge_hits(h, merge_gap_ns=5.0)
        assert merged["height"][0] == 9.0
        assert merged["timestamp"][0] == 10_000

    def test_tie_prefers_earliest(self):
        h = _hits(np.array([0, 10_000]), height=[5.0, 5.0])
        merged, _, _ = merge_hits(h, merge_gap_ns=5.0)
        assert merged["timestamp"][0] == 0

    def test_integral_summed(self):
        h = _hits(np.array([0, 10_000]), integral=[10.0, 32.0])
        merged, _, _ = merge_hits(h, merge_gap_ns=5.0)
        np.testing.assert_allclose(merged["integral"], [42.0])

    def test_cross_record_window_invalidated(self):
        # components from different records: the union sample window is
        # meaningless; edges become negative sentinels
        h = _hits(np.array([0, 10_000]), record_id=[7, 8])
        merged, _, comp = merge_hits(h, merge_gap_ns=5.0)
        assert len(merged["timestamp"]) == 1
        assert merged["sample_start"][0] < 0 or merged["sample_end"][0] < 0

    def test_same_record_window_union(self):
        h = _hits(np.array([0, 10_000]), record_id=[7, 7])
        h["edge_start"] = np.array([8.0, 13.0])
        h["edge_end"] = np.array([12.0, 17.0])
        # abs gap between the windows is 12 ns at dt=2: merge at 15 ns
        merged, _, _ = merge_hits(h, merge_gap_ns=15.0)
        assert len(merged["timestamp"]) == 1
        assert merged["sample_start"][0] == 8
        assert merged["sample_end"][0] == 17


class TestComponentTables:
    def test_component_rows_consistent(self):
        ts = np.array([0, 10_000, 100_000_000, 100_010_000, 100_020_000])
        merged, clusters, comps = merge_hits(_hits(ts), merge_gap_ns=5.0)
        n_merged = len(merged["timestamp"])
        assert n_merged == 2
        # offsets/counts tile the component rows exactly
        total = 0
        for mi in range(n_merged):
            off = merged["component_offset"][mi]
            cnt = merged["component_count"][mi]
            assert off == total
            rows = comps[off:off + cnt]
            assert np.all(rows[:, 0] == mi)
            total += cnt
        assert total == len(comps) == 5
        # every original hit appears exactly once
        assert sorted(comps[:, 1]) == list(range(5))

    def test_cluster_rows_cover_all_hits(self):
        ts = np.array([0, 10_000, 50_000_000])
        _, clusters, _ = merge_hits(_hits(ts), merge_gap_ns=5.0)
        assert sorted(clusters[:, 1]) == [0, 1, 2]
        assert set(clusters[:, 0]) == {0, 1}

    def test_empty_input(self):
        merged, clusters, comps = merge_hits(_hits(np.array([])), 5.0)
        assert len(merged["timestamp"]) == 0
        assert clusters.shape == (0, 2) and comps.shape == (0, 2)
