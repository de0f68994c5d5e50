"""Sharded time-sorted merge: 8-device parity with host lexsort.

Covers parallel/sorted_merge.py (SURVEY §7 hard part): per-shard local sort
+ block odd-even merge-split over ppermute must equal a host lexsort on the
gathered data — including duplicate keys, multi-key ordering, non-multiple
shard sizes, and segment-break layouts.
"""

import numpy as np
import pytest

import jax

from waveformanalysis_tpu.parallel.mesh import make_mesh
from waveformanalysis_tpu.parallel.sorted_merge import (
    make_sharded_time_sort,
    sharded_time_sort,
)


def _host_sorted(cols, key_names):
    keys = tuple(np.asarray(cols[k]) for k in reversed(list(key_names)))
    order = np.lexsort(keys)
    return {k: np.asarray(v)[order] for k, v in cols.items()}


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


class TestShardedTimeSort:
    def test_random_parity(self, mesh8, rng):
        n = 8 * 500
        cols = {
            "timestamp": rng.integers(10**14, 10**15, n).astype(np.int64),
            "record_id": rng.permutation(n).astype(np.int64),
            "area": rng.uniform(0, 100, n),
        }
        out = sharded_time_sort(cols, ("timestamp", "record_id"), mesh8)
        exp = _host_sorted(cols, ("timestamp", "record_id"))
        for k in cols:
            np.testing.assert_array_equal(out[k], exp[k], err_msg=k)

    def test_duplicate_keys_no_loss(self, mesh8, rng):
        # heavy duplication: every row kept exactly once, secondary key
        # breaks ties deterministically
        n = 8 * 128
        cols = {
            "timestamp": rng.integers(0, 20, n).astype(np.int64),
            "record_id": rng.permutation(n).astype(np.int64),
        }
        out = sharded_time_sort(cols, ("timestamp", "record_id"), mesh8)
        exp = _host_sorted(cols, ("timestamp", "record_id"))
        np.testing.assert_array_equal(out["timestamp"], exp["timestamp"])
        np.testing.assert_array_equal(out["record_id"], exp["record_id"])
        assert set(out["record_id"]) == set(range(n))

    def test_non_multiple_size_pads_cleanly(self, mesh8, rng):
        n = 8 * 100 + 37
        cols = {
            "timestamp": rng.integers(10**12, 10**13, n).astype(np.int64),
            "record_id": np.arange(n, dtype=np.int64),
        }
        out = sharded_time_sort(cols, ("timestamp", "record_id"), mesh8)
        exp = _host_sorted(cols, ("timestamp", "record_id"))
        assert len(out["timestamp"]) == n
        np.testing.assert_array_equal(out["timestamp"], exp["timestamp"])
        np.testing.assert_array_equal(out["record_id"], exp["record_id"])

    def test_segment_break_datasets(self, mesh8, rng):
        # two clusters separated by a large gap (break layout) interleaved
        # across shards; plus a second dataset with three segments
        for n_segments in (2, 3):
            parts = []
            for s in range(n_segments):
                base = 10**14 * (s + 1)
                parts.append(base + np.sort(rng.integers(0, 10**9, 700)))
            ts = np.concatenate(parts)
            rng.shuffle(ts)
            n = len(ts)
            cols = {
                "timestamp": ts.astype(np.int64),
                "record_id": np.arange(n, dtype=np.int64),
                "channel": rng.integers(0, 4, n).astype(np.int64),
            }
            out = sharded_time_sort(
                cols, ("timestamp", "channel", "record_id"), mesh8
            )
            exp = _host_sorted(cols, ("timestamp", "channel", "record_id"))
            for k in cols:
                np.testing.assert_array_equal(out[k], exp[k], err_msg=k)

    def test_wave_payload_rows_follow_keys(self, mesh8, rng):
        # 2-D payload columns (wave rows) must travel with their keys
        n = 8 * 64
        waves = rng.integers(0, 1000, (n, 32)).astype(np.int64)
        cols = {
            "timestamp": rng.integers(0, 10**9, n).astype(np.int64),
            "record_id": np.arange(n, dtype=np.int64),
            "wave": waves,
        }
        out = sharded_time_sort(cols, ("timestamp", "record_id"), mesh8)
        exp = _host_sorted(cols, ("timestamp", "record_id"))
        np.testing.assert_array_equal(out["wave"], exp["wave"])

    def test_single_device_mesh(self, rng):
        mesh1 = make_mesh(1)
        n = 333
        cols = {
            "timestamp": rng.integers(0, 10**6, n).astype(np.int64),
            "record_id": np.arange(n, dtype=np.int64),
        }
        out = sharded_time_sort(cols, ("timestamp", "record_id"), mesh1)
        exp = _host_sorted(cols, ("timestamp", "record_id"))
        np.testing.assert_array_equal(out["timestamp"], exp["timestamp"])

    def test_presorted_shards_fast_path_correct(self, mesh8):
        # globally sorted input stays identical
        n = 8 * 64
        cols = {
            "timestamp": np.arange(n, dtype=np.int64) * 1000,
            "record_id": np.arange(n, dtype=np.int64),
        }
        out = sharded_time_sort(cols, ("timestamp", "record_id"), mesh8)
        np.testing.assert_array_equal(out["timestamp"], cols["timestamp"])
        np.testing.assert_array_equal(out["record_id"], cols["record_id"])


class TestRecordsMergeOnMesh:
    def test_mesh_merge_equals_host_merge(self, mesh8, rng):
        from waveformanalysis_tpu.processing.records_builder import (
            build_records_from_st_waveforms,
            merge_records_parts,
        )
        from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms

        parts = []
        for ch in range(3):
            st = make_fake_st_waveforms(
                n_events=77, wave_length=32, n_channels=1, seed=ch,
            )
            st["channel"] = ch
            st["timestamp"] = (
                rng.integers(0, 10**9, 77).astype(np.int64) * 1000
            )
            parts.append(build_records_from_st_waveforms(st))
        host = merge_records_parts(list(parts))
        mesh = merge_records_parts(list(parts), mesh=mesh8)
        assert len(host.records) == len(mesh.records) == 3 * 77
        for k in host.records.field_names:
            np.testing.assert_array_equal(
                np.asarray(host.records[k]), np.asarray(mesh.records[k]),
                err_msg=k,
            )
        np.testing.assert_array_equal(host.wave_pool, mesh.wave_pool)
