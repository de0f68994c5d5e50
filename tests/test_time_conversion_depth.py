"""Time-conversion depth (reference analog: foundation/time_conversion.py:
52-430): EpochInfo round trips, TimeConverter relative<->absolute laws,
EpochExtractor filename/header/ctime fallbacks, and the dual ps/ns time
domains the pipeline relies on.
"""

from datetime import datetime, timezone
from pathlib import Path

import numpy as np
import pytest

from waveformanalysis_tpu.foundation.time_conversion import (
    EpochExtractor,
    EpochInfo,
    TimeConverter,
)


EPOCH = datetime(2026, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


class TestEpochInfo:
    def test_from_datetime_and_ns(self):
        info = EpochInfo.from_datetime(EPOCH, source="test")
        assert info.epoch_ns == int(EPOCH.timestamp() * 1e9)
        assert info.epoch_source == "test"

    def test_from_timestamp_seconds(self):
        info = EpochInfo.from_timestamp(EPOCH.timestamp())
        assert info.epoch_ns == int(EPOCH.timestamp() * 1e9)

    def test_dict_round_trip(self):
        info = EpochInfo.from_datetime(EPOCH, source="rt")
        back = EpochInfo.from_dict(info.to_dict())
        assert back.epoch_ns == info.epoch_ns
        assert back.epoch_source == info.epoch_source


class TestTimeConverter:
    def test_relative_absolute_inverse(self):
        tc = TimeConverter(EpochInfo.from_datetime(EPOCH))
        rel_ps = np.array([0, 1_000_000, 5_000_000_000], dtype=np.int64)
        abs_t = tc.relative_to_absolute(rel_ps)
        back = tc.absolute_to_relative(abs_t)
        np.testing.assert_array_equal(np.asarray(back, dtype=np.int64), rel_ps)

    def test_zero_maps_to_epoch(self):
        tc = TimeConverter(EpochInfo.from_datetime(EPOCH))
        out = tc.relative_to_absolute(np.array([0], dtype=np.int64))
        first = out[0] if hasattr(out, "__len__") else out
        if isinstance(first, datetime):
            assert abs((first - EPOCH).total_seconds()) < 1e-6
        else:
            assert int(first) == int(EPOCH.timestamp() * 1e9)

    def test_convert_time_range(self):
        # default epoch time_unit is ns: one second spans 1e9 relative units
        tc = TimeConverter(EpochInfo.from_datetime(EPOCH))
        lo, hi = tc.convert_time_range(EPOCH, datetime(
            2026, 3, 1, 12, 0, 1, tzinfo=timezone.utc,
        ))
        assert hi - lo == int(1e9)
        lo2, hi2 = tc.convert_time_range(None, EPOCH)
        assert lo2 is None and hi2 == lo


class TestEpochExtractor:
    def test_filename_patterns(self):
        ex = EpochExtractor()
        dt = ex.extract_from_filename("Data_CH0@DT5730_20260301_120000.CSV")
        if dt is not None:
            assert (dt.year, dt.month, dt.day) == (2026, 3, 1)
        dt2 = ex.extract_from_filename("run_2026-03-01_12-00-00_CH1.CSV")
        assert dt2 is None or dt2.year == 2026

    def test_no_timestamp_in_name(self):
        ex = EpochExtractor()
        assert ex.extract_from_filename("Data_CH0_0.CSV") is None

    def test_ctime_fallback(self, tmp_path):
        f = tmp_path / "plain.bin"
        f.write_bytes(b"x")
        ex = EpochExtractor()
        dt = ex.extract_from_file_ctime(f)
        assert dt is not None
        assert abs(dt.timestamp() - f.stat().st_ctime) < 2.0

    def test_auto_extract_prefers_filename(self, tmp_path):
        f = tmp_path / "Data_20260301_120000_CH0.CSV"
        f.write_text("h\n")
        ex = EpochExtractor()
        info = ex.auto_extract([f])
        assert info is not None
        assert info.epoch_source in ("filename", "ctime", "csv_header")
        if info.epoch_source == "filename":
            assert info.epoch_datetime.year == 2026


class TestContextTimeDomain:
    def test_set_epoch_roundtrip_through_context(self, tmp_path):
        from waveformanalysis_tpu.testing.fixtures import (
            make_fake_st_waveforms,
            make_tiny_context,
        )

        ctx = make_tiny_context(
            tmp_path, st_waveforms=make_fake_st_waveforms(8, 32)
        )
        info = ctx.set_epoch("test_run", EPOCH)
        assert info.epoch_ns == int(EPOCH.timestamp() * 1e9)
        got = ctx.get_epoch("test_run") if hasattr(ctx, "get_epoch") else info
        assert got.epoch_ns == info.epoch_ns

    def test_absolute_time_range_query(self, tmp_path):
        from waveformanalysis_tpu.testing.fixtures import (
            make_fake_st_waveforms,
            make_tiny_context,
        )

        st = make_fake_st_waveforms(16, 32)
        ctx = make_tiny_context(tmp_path, st_waveforms=st)
        ctx.set_epoch("test_run", EPOCH)
        start = EPOCH
        end = datetime(2026, 3, 1, 12, 0, 1, tzinfo=timezone.utc)
        out = ctx.time_range_absolute(
            "test_run", "st_waveforms", start, end,
        )
        # all fixture timestamps are < 1 s after epoch
        assert len(out) == 16
