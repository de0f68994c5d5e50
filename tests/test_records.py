"""Records builder / view / plugin tests."""

import numpy as np
import pytest

from tests.utils import create_daq_run, write_v1725_run
from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.data.records_view import RecordsView
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.records import (
    RecordsPlugin,
    WavePoolFilteredPlugin,
    WavePoolPlugin,
)
from waveformanalysis_tpu.plugins.builtin.waveforms import (
    RawFileNamesPlugin,
    WaveformsPlugin,
)
from waveformanalysis_tpu.processing import records_builder as RB
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms


class TestSortAndGather:
    def test_gather_pool(self):
        pool = np.arange(20, dtype=np.uint16)
        out, offs = RB.gather_pool(pool, np.array([10, 0]), np.array([4, 3]))
        np.testing.assert_array_equal(out, [10, 11, 12, 13, 0, 1, 2])
        np.testing.assert_array_equal(offs, [0, 4])

    def test_sort_contract(self):
        # primary timestamp, then pid, board, channel, stable input order
        tbl = Table({
            "timestamp": np.array([100, 50, 100, 50], dtype=np.int64),
            "pid": np.array([0, 1, 0, 0], dtype=np.int32),
            "board": np.zeros(4, np.int16),
            "channel": np.array([1, 0, 0, 0], dtype=np.int16),
            "wave_offset": np.array([0, 4, 8, 12], dtype=np.int64),
            "event_length": np.full(4, 4, np.int32),
            "record_id": np.arange(4, dtype=np.int64),
        })
        pool = np.arange(16, dtype=np.uint16)
        bundle = RB.sort_bundle(RB.RecordsBundle(tbl, pool))
        ts = np.asarray(bundle.records["timestamp"])
        np.testing.assert_array_equal(ts, [50, 50, 100, 100])
        # ts=50: pid 0 (row 3) before pid 1 (row 1)
        np.testing.assert_array_equal(np.asarray(bundle.records["pid"]), [0, 1, 0, 0])
        # ts=100: channel 0 before channel 1
        np.testing.assert_array_equal(np.asarray(bundle.records["channel"])[2:], [0, 1])
        # wave_pool slices follow their records
        rv = RecordsView(bundle.records, bundle.wave_pool)
        np.testing.assert_array_equal(rv.waves(0), [12, 13, 14, 15])
        np.testing.assert_array_equal(rv.waves(1), [4, 5, 6, 7])
        # record_id re-sequenced
        np.testing.assert_array_equal(np.asarray(bundle.records["record_id"]), range(4))

    def test_merge_parts_equivalent_to_global_sort(self, rng):
        parts = []
        all_ts = []
        for pid in range(3):
            n = 50
            ts = rng.integers(0, 10_000, n).astype(np.int64)
            ts.sort()
            all_ts.append(ts)
            tbl = Table({
                "timestamp": ts,
                "pid": np.full(n, 0, np.int32),
                "board": np.zeros(n, np.int16),
                "channel": np.full(n, pid, np.int16),
                "wave_offset": np.arange(n, dtype=np.int64) * 2,
                "event_length": np.full(n, 2, np.int32),
                "record_id": np.arange(n, dtype=np.int64),
            })
            pool = rng.integers(0, 1000, n * 2).astype(np.uint16)
            parts.append(RB.RecordsBundle(tbl, pool))
        merged = RB.merge_records_parts(parts)
        ts = np.asarray(merged.records["timestamp"])
        assert np.all(np.diff(ts) >= 0)
        assert len(merged.records) == 150
        assert len(merged.wave_pool) == 300
        # offsets contiguous
        offs = np.asarray(merged.records["wave_offset"])
        np.testing.assert_array_equal(offs, np.arange(150) * 2)


class TestBuildFromStWaveforms:
    def test_roundtrip(self):
        st = make_fake_st_waveforms(n_events=10, wave_length=32)
        bundle = RB.build_records_from_st_waveforms(st, default_dt_ns=2)
        assert len(bundle) == 10
        rec = bundle.records
        assert np.all(np.diff(np.asarray(rec["timestamp"])) >= 0)
        rv = RecordsView(rec, bundle.wave_pool)
        # waves survive the build (uint16 view of int16 data)
        w0 = rv.waves(0)
        assert len(w0) == 32


class TestRecordsView:
    def test_padded_matrix_and_signals(self):
        lengths = np.array([4, 6], dtype=np.int32)
        offsets = np.array([0, 4], dtype=np.int64)
        pool = np.array([10, 20, 30, 40, 1, 2, 3, 4, 5, 6], dtype=np.uint16)
        rec = Table({
            "wave_offset": offsets, "event_length": lengths,
            "record_id": np.arange(2, dtype=np.int64),
            "baseline": np.array([25.0, 3.0]),
            "polarity": np.array([-1, 1], dtype=np.int8),
            "board": np.zeros(2, np.int16), "channel": np.arange(2, dtype=np.int16),
        })
        rv = RecordsView(rec, pool)
        np.testing.assert_array_equal(rv.waves(0), [10, 20, 30, 40])
        np.testing.assert_array_equal(rv.waves(1, window=(1, 3)), [2, 3])
        # negative polarity: baseline - wave; positive: wave - baseline
        np.testing.assert_allclose(rv.signals(0), [15, 5, -5, -15])
        np.testing.assert_allclose(rv.signals(1), [-2, -1, 0, 1, 2, 3])
        waves, lens = rv.padded_wave_matrix()
        assert waves.shape == (2, 128)  # padded to lane multiple
        np.testing.assert_array_equal(lens, lengths)
        assert waves[0, 4] == 0  # padding zeroed
        # device gather variant matches the host matrix exactly
        dwaves, dlens = rv.padded_wave_matrix_device()
        np.testing.assert_array_equal(np.asarray(dwaves), waves)
        np.testing.assert_array_equal(np.asarray(dlens), lens)


@pytest.fixture
def vx_ctx(tmp_path):
    create_daq_run(tmp_path / "daq", run_name="r1", n_channels=2,
                   n_files_per_channel=2, n_rows=5, n_samples=40)
    ctx = Context(
        storage_dir=str(tmp_path / "store"),
        config={"show_progress": False, "data_root": str(tmp_path / "daq"),
                "daq_adapter": "vx2730"},
    )
    ctx.register(RawFileNamesPlugin(), WaveformsPlugin(), RecordsPlugin(),
                 WavePoolPlugin())
    return ctx


class TestEndToEndVX2730:
    def test_raw_files(self, vx_ctx):
        raw = vx_ctx.get_data("r1", "raw_files")
        assert len(raw) == 2
        assert len(raw[0]) == 2

    def test_st_waveforms(self, vx_ctx):
        st = vx_ctx.get_data("r1", "st_waveforms")
        assert len(st) == 20  # 2 ch x 2 files x 5 rows
        assert np.asarray(st["wave"]).shape[1] == 40
        assert set(np.asarray(st["channel"]).tolist()) == {0, 1}
        # baseline = mean of columns 7..47 of raw -> first 40 samples
        waves = np.asarray(st["wave"])
        expected_baseline = waves.astype(np.float64).mean(axis=1)
        np.testing.assert_allclose(np.asarray(st["baseline"]), expected_baseline)
        # record_id sequential
        np.testing.assert_array_equal(np.asarray(st["record_id"]), np.arange(20))

    def test_records_and_pool_share_bundle(self, vx_ctx):
        rec = vx_ctx.get_data("r1", "records")
        pool = vx_ctx.get_data("r1", "wave_pool")
        assert len(rec) == 20
        ts = np.asarray(rec["timestamp"])
        assert np.all(np.diff(ts) >= 0)  # globally sorted
        assert len(pool) == 20 * 40
        rv = RecordsView(rec, np.asarray(pool))
        assert len(rv.waves(0)) == 40

    def test_basic_features_from_records(self, vx_ctx):
        vx_ctx.register(BasicFeaturesPlugin())
        vx_ctx.set_config({"basic_features": {"wave_source": "records",
                                              "height_range": (0, None)}})
        out = vx_ctx.get_data("r1", "basic_features")
        assert len(out) == 20
        # pulse of height ~200 was injected at column 45 -> sample 38
        assert np.asarray(out["height"]).max() > 150


class TestEndToEndV1725:
    def test_v1725_records(self, tmp_path):
        write_v1725_run(tmp_path / "daq", run_name="rb", n_events=3)
        ctx = Context(
            storage_dir=str(tmp_path / "store"),
            config={"show_progress": False, "data_root": str(tmp_path / "daq"),
                    "daq_adapter": "v1725"},
        )
        ctx.register(RawFileNamesPlugin(), RecordsPlugin(), WavePoolPlugin())
        ctx.set_config({"raw_files": {"daq_adapter": "v1725"},
                        "records": {"daq_adapter": "v1725"},
                        "wave_pool": {"daq_adapter": "v1725"}})
        rec = ctx.get_data("rb", "records")
        assert len(rec) == 6  # 3 events x 2 channels
        # timestamps sample-index -> ps at 250 MHz
        ts = np.asarray(rec["timestamp"])
        assert ts.min() == 1000 * 4000
        assert set(np.asarray(rec["channel"]).tolist()) == {0, 1}

    def test_v1725_st_waveforms(self, tmp_path):
        write_v1725_run(tmp_path / "daq", run_name="rb", n_events=2)
        ctx = Context(
            storage_dir=str(tmp_path / "store"),
            config={"show_progress": False, "data_root": str(tmp_path / "daq"),
                    "daq_adapter": "v1725",
                    "raw_files": {"daq_adapter": "v1725"},
                    "st_waveforms": {"daq_adapter": "v1725"}},
        )
        ctx.register(RawFileNamesPlugin(), WaveformsPlugin())
        st = ctx.get_data("rb", "st_waveforms")
        assert len(st) == 4
        assert np.asarray(st["baseline"]).tolist() == [900, 1100, 900, 1100]


class TestWavePoolFiltered:
    def test_filtered_pool(self, vx_ctx):
        # reference option surface (records.py:337-367): same names and
        # defaults as filtered_waveforms
        vx_ctx.register(WavePoolFilteredPlugin())
        vx_ctx.set_config({"wave_pool_filtered": {
            "filter_type": "SG", "sg_window_size": 7, "sg_poly_order": 2,
        }})
        out = vx_ctx.get_data("r1", "wave_pool_filtered")
        pool = vx_ctx.get_data("r1", "wave_pool")
        assert out.dtype == np.float32
        assert len(out) == len(pool)
        # smoothing reduces total variation
        assert np.abs(np.diff(out[:40])).sum() < np.abs(np.diff(
            np.asarray(pool[:40]).astype(np.float32))).sum()

    def test_default_matches_filtered_waveforms(self, vx_ctx):
        """The default SG(11,2) pool slices must equal filtered_waveforms'
        waves for the same physical rows (the records source under
        use_filtered reads THIS pool; reference _wave_source.py:103-106)."""
        from waveformanalysis_tpu.data.records_view import RecordsView
        from waveformanalysis_tpu.plugins.builtin.filtering import (
            FilteredWaveformsPlugin,
        )

        vx_ctx.register(WavePoolFilteredPlugin(), FilteredWaveformsPlugin())
        records = vx_ctx.get_data("r1", "records")
        fpool = vx_ctx.get_data("r1", "wave_pool_filtered")
        fw = vx_ctx.get_data("r1", "filtered_waveforms")
        fw_np = fw.to_numpy() if hasattr(fw, "to_numpy") else np.asarray(fw)
        view = RecordsView(records, fpool)
        rec_np = records.to_numpy() if hasattr(records, "to_numpy") \
            else np.asarray(records)
        key_fw = {(int(r["timestamp"]), int(r["board"]), int(r["channel"])): i
                  for i, r in enumerate(fw_np)}
        checked = 0
        for i, r in enumerate(rec_np):
            j = key_fw.get((int(r["timestamp"]), int(r["board"]),
                            int(r["channel"])))
            if j is None:
                continue
            L = int(r["event_length"])
            got = view.wave_pool[r["wave_offset"]: r["wave_offset"] + L]
            np.testing.assert_allclose(
                got, fw_np["wave"][j][:L], rtol=1e-6, atol=1e-4,
                err_msg=f"row {i}",
            )
            checked += 1
        assert checked > 0


class TestBuildInvariance:
    """The bundle must be bit-identical however the build is partitioned:
    part size and channel-worker count are pure perf knobs."""

    @pytest.mark.parametrize("part_size,workers", [
        (7, 1), (25, 1), (1000, 1), (25, 4), (1000, 4),
    ])
    def test_partitioning_invariant(self, tmp_path, part_size, workers):
        from waveformanalysis_tpu.processing.loader import get_raw_files
        from waveformanalysis_tpu.processing.records_builder import (
            build_records_from_raw_files,
        )

        create_daq_run(tmp_path / "daq", run_name="r1", n_channels=3,
                       n_files_per_channel=2, n_rows=40, n_samples=24)
        raw = get_raw_files("r1", data_root=str(tmp_path / "daq"),
                            daq_adapter="vx2730")
        ref = build_records_from_raw_files(raw, adapter_name="vx2730",
                                           default_dt_ns=2)
        got = build_records_from_raw_files(
            raw, adapter_name="vx2730", default_dt_ns=2,
            part_size=part_size, channel_workers=workers,
        )
        h_ref, h_got = ref.records.to_host(), got.records.to_host()
        assert len(h_ref) == len(h_got)
        for k in h_ref.columns:
            if k == "pid":
                continue  # part index; partitioning-dependent by design
            np.testing.assert_array_equal(
                np.asarray(h_ref[k]), np.asarray(h_got[k]), err_msg=k
            )
        np.testing.assert_array_equal(ref.wave_pool, got.wave_pool)


class TestDeviceSortOrder:
    """Device records sort order (records_builder.records_sort_order_device):
    multi-operand lax.sort vs the host lexsort oracle — exact permutation
    equality including stability under duplicate keys."""

    def _bundle(self, n=500, seed=4):
        from waveformanalysis_tpu.dtypes.schema import Field, Schema
        from waveformanalysis_tpu.dtypes.table import Table as T
        from waveformanalysis_tpu.plugins.builtin.records import RECORDS_SCHEMA

        rng = np.random.default_rng(seed)
        # duplicate-heavy keys to stress stability
        cols = {
            "timestamp": rng.integers(0, 50, n).astype(np.int64) * 1_000_000,
            "pid": rng.integers(0, 3, n).astype(np.int32),
            "board": rng.integers(0, 2, n).astype(np.int16),
            "channel": rng.integers(0, 2, n).astype(np.int16),
        }
        t = T.zeros(n, RECORDS_SCHEMA)
        return t.with_columns(**cols)

    def test_matches_host_oracle_with_duplicates(self):
        from waveformanalysis_tpu.processing import records_builder as RB

        recs = self._bundle()
        np.testing.assert_array_equal(
            RB.records_sort_order(recs),
            RB.records_sort_order_device(recs),
        )

    def test_empty(self):
        from waveformanalysis_tpu.processing import records_builder as RB

        recs = self._bundle(n=0)
        assert len(RB.records_sort_order_device(recs)) == 0

    def test_backend_resolution_and_env_override(self, monkeypatch):
        from waveformanalysis_tpu.processing.records_builder import (
            resolve_records_sort_backend,
        )

        assert resolve_records_sort_backend("auto") == "host"
        assert resolve_records_sort_backend("device") == "device"
        monkeypatch.setenv("WFA_RECORDS_SORT_BACKEND", "device")
        assert resolve_records_sort_backend("auto") == "device"
        monkeypatch.delenv("WFA_RECORDS_SORT_BACKEND")
        with pytest.raises(ValueError):
            resolve_records_sort_backend("nope")

    def test_sort_bundle_device_backend_bit_identical(self):
        from waveformanalysis_tpu.processing import records_builder as RB

        recs = self._bundle(n=300, seed=8)
        lengths = np.full(300, 8, np.int32)
        offsets = (np.arange(300, dtype=np.int64) * 8)
        recs = recs.with_columns(event_length=lengths, wave_offset=offsets)
        pool = np.arange(300 * 8, dtype=np.uint16)
        host = RB.sort_bundle(
            RB.RecordsBundle(records=recs, wave_pool=pool.copy()),
            sort_backend="host",
        )
        dev = RB.sort_bundle(
            RB.RecordsBundle(records=recs, wave_pool=pool.copy()),
            sort_backend="device",
        )
        for f in host.records.field_names:
            np.testing.assert_array_equal(
                np.asarray(host.records[f]), np.asarray(dev.records[f]),
                err_msg=f,
            )
        np.testing.assert_array_equal(host.wave_pool, dev.wave_pool)
