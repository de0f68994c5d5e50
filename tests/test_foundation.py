"""Foundation layer unit tests: units, time conversion, profiler, errors."""

from datetime import datetime, timezone

import numpy as np
import pytest

from waveformanalysis_tpu.foundation.exceptions import ErrorSeverity, PluginError
from waveformanalysis_tpu.foundation.error import ErrorManager
from waveformanalysis_tpu.foundation.profiler import Profiler
from waveformanalysis_tpu.foundation.time_conversion import (
    EpochExtractor,
    EpochInfo,
    TimeConverter,
)
from waveformanalysis_tpu.foundation.units import (
    StandardUnits,
    convert_frequency,
    convert_time,
    sampling_rate_to_interval_ns,
)


class TestUnits:
    def test_standard_units(self):
        assert StandardUnits.TIMESTAMP_UNIT == "ps"
        assert StandardUnits.SYSTEM_TIME_UNIT == "ns"
        assert StandardUnits.SAMPLE_INTERVAL_UNIT == "ns"

    def test_convert_time(self):
        assert convert_time(1.0, "ns", "ps") == 1000.0
        assert convert_time(1000.0, "ps", "ns") == 1.0
        assert convert_time(1.0, "s", "ns") == 1e9
        assert convert_time(2.5, "us", "ns") == 2500.0

    def test_convert_time_bad_unit(self):
        with pytest.raises(ValueError):
            convert_time(1.0, "fortnight", "ns")

    def test_convert_frequency(self):
        assert convert_frequency(1.0, "GHz", "MHz") == 1000.0
        assert convert_frequency(500.0, "MHz", "Hz") == 5e8

    def test_sampling_rate_to_interval(self):
        assert sampling_rate_to_interval_ns(500e6) == 2.0
        with pytest.raises(ValueError):
            sampling_rate_to_interval_ns(0)


class TestTimeConversion:
    def test_epoch_roundtrip_scalar(self):
        dt = datetime(2024, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
        epoch = EpochInfo.from_datetime(dt, source="manual")
        conv = TimeConverter(epoch)
        abs_dt = conv.relative_to_absolute(1_000_000_000)  # +1 s
        assert abs_dt == datetime(2024, 1, 1, 12, 0, 1, tzinfo=timezone.utc)
        assert conv.absolute_to_relative(abs_dt) == 1_000_000_000

    def test_epoch_roundtrip_array(self):
        dt = datetime(2024, 1, 1, tzinfo=timezone.utc)
        conv = TimeConverter(EpochInfo.from_datetime(dt))
        rel = np.array([0, 1_000_000_000, 2_000_000_000], dtype=np.int64)
        abs_arr = conv.relative_to_absolute(rel)
        back = conv.absolute_to_relative(abs_arr)
        np.testing.assert_array_equal(back, rel)

    def test_epoch_info_serialization(self):
        epoch = EpochInfo.from_datetime(
            datetime(2024, 3, 2, 8, 30, tzinfo=timezone.utc), source="filename"
        )
        restored = EpochInfo.from_dict(epoch.to_dict())
        assert restored.epoch_timestamp == epoch.epoch_timestamp
        assert restored.epoch_source == "filename"

    def test_extract_from_filename(self):
        ex = EpochExtractor()
        dt = ex.extract_from_filename("run_2024-01-01_12-00-00_CH0.CSV")
        assert dt == datetime(2024, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
        dt2 = ex.extract_from_filename("data_20240101120000.bin")
        assert dt2 == datetime(2024, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
        assert ex.extract_from_filename("no_date_here.csv") is None

    def test_auto_extract_falls_back_to_ctime(self, tmp_path):
        f = tmp_path / "plain.csv"
        f.write_text("a;b;c\n")
        info = EpochExtractor().auto_extract([f])
        assert info is not None
        assert info.epoch_source == "file_ctime"


class TestProfiler:
    def test_time_and_summary(self):
        prof = Profiler()
        with prof.time("step"):
            pass
        with prof.time("step"):
            pass
        st = prof.get("step")
        assert st["count"] == 2
        assert "step" in prof.summary()

    def test_disabled(self):
        prof = Profiler(enabled=False)
        with prof.time("x"):
            pass
        assert prof.get("x") is None


class TestErrors:
    def test_plugin_error_severity(self):
        err = PluginError("boom", plugin_name="hit", severity=ErrorSeverity.RECOVERABLE)
        assert err.recoverable
        assert "hit" in str(err)
        fatal = PluginError("dead", severity=ErrorSeverity.FATAL)
        assert not fatal.recoverable

    def test_error_manager_records(self):
        mgr = ErrorManager(max_records=2)
        for i in range(3):
            try:
                raise ValueError(f"e{i}")
            except ValueError as e:
                mgr.record(e, plugin_name="p", run_id="r")
        assert len(mgr.records) == 2
        assert "e2" in mgr.summary()

    def test_collect_context_shapes(self):
        mgr = ErrorManager()
        snap = mgr.collect_context(inputs={"wave": np.zeros((4, 8), dtype=np.int16)})
        assert snap["inputs"]["wave"]["shape"] == (4, 8)
