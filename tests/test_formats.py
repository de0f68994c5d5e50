"""DAQ format adapter tests: VX2730 CSV, V1725 binary, layouts, registry."""

import numpy as np
import pytest

from tests.utils import (
    create_daq_run,
    make_v1725_event,
    make_vx2730_csv_rows,
    write_v1725_run,
    write_vx2730_file,
)
from waveformanalysis_tpu.formats import (
    DirectoryLayout,
    get_adapter,
    is_adapter_registered,
    list_adapters,
)
from waveformanalysis_tpu.formats.base import RawTimestampMode
from waveformanalysis_tpu.formats.generic import make_generic_adapter
from waveformanalysis_tpu.formats.v1725 import V1725Reader
from waveformanalysis_tpu.formats.vx2730 import VX2730Reader


class TestRegistry:
    def test_builtin_adapters_registered(self):
        names = list_adapters()
        assert "vx2730" in names
        assert "v1725" in names
        assert is_adapter_registered("vx2730")

    def test_unknown_adapter(self):
        with pytest.raises(KeyError, match="Unknown DAQ adapter"):
            get_adapter("doesnotexist")

    def test_adapter_info_inference(self):
        from waveformanalysis_tpu.config.adapter_info import get_adapter_info

        info = get_adapter_info("vx2730")
        assert info.sampling_rate_hz == 500e6
        assert info.dt_ns == 2
        assert info.timestamp_unit == "ps"
        info2 = get_adapter_info("v1725")
        assert info2.dt_ns == 4
        assert info2.raw_timestamp_mode == "sample_index"


class TestDirectoryLayout:
    def test_channel_and_index_extraction(self):
        layout = DirectoryLayout(name="t")
        assert layout.extract_channel("Data_CH3_0.CSV") == 3
        assert layout.extract_channel("nochannel.csv") is None
        assert layout.extract_file_index("Data_CH3_7.CSV") == 7

    def test_group_files_by_channel(self, tmp_path):
        run = create_daq_run(tmp_path, n_channels=2, n_files_per_channel=3)
        layout = DirectoryLayout(name="t")
        groups = layout.group_files_by_channel(run / "RAW")
        assert sorted(groups) == [0, 1]
        assert [f["index"] for f in groups[0]] == [0, 1, 2]

    def test_raw_path_template(self):
        layout = DirectoryLayout(name="t", raw_subdir="")
        p = layout.get_raw_path("/data", "run1")
        assert str(p) == "/data/run1"


class TestVX2730:
    def test_read_file_with_header(self, tmp_path):
        rows = make_vx2730_csv_rows(5, channel=0, n_samples=16)
        f = tmp_path / "Data_CH0_0.CSV"
        write_vx2730_file(f, rows, with_header=True)
        reader = VX2730Reader()
        arr = reader.read_file(f, is_first_file=True)
        assert arr.shape == (5, 7 + 16)
        cols = reader.extract_columns(arr)
        np.testing.assert_array_equal(cols["channel"], np.zeros(5))
        assert cols["samples"].shape == (5, 16)

    def test_header_policy_other_files(self, tmp_path):
        rows = make_vx2730_csv_rows(3, channel=1, n_samples=8)
        f = tmp_path / "Data_CH1_1.CSV"
        write_vx2730_file(f, rows, with_header=False)
        arr = VX2730Reader().read_file(f, is_first_file=False)
        assert arr.shape[0] == 3

    def test_engines_agree(self, tmp_path):
        rows = make_vx2730_csv_rows(4, channel=0, n_samples=12)
        f = tmp_path / "Data_CH0_0.CSV"
        write_vx2730_file(f, rows)
        results = {}
        for engine in ("pyarrow", "pandas"):
            try:
                results[engine] = VX2730Reader(parse_engine=engine).read_file(f)
            except (RuntimeError, ImportError):
                pass
        numpy_arr = VX2730Reader(parse_engine="numpy").read_file(f)
        for engine, arr in results.items():
            np.testing.assert_allclose(arr, numpy_arr, err_msg=engine)

    def test_scan_and_load(self, tmp_path):
        create_daq_run(tmp_path, run_name="r1", n_channels=2,
                       n_files_per_channel=2, n_rows=6)
        adapter = get_adapter("vx2730")
        groups = adapter.scan_run(str(tmp_path), "r1")
        assert sorted(groups) == [0, 1]
        assert len(groups[0]) == 2
        data = adapter.load_channel(str(tmp_path), "r1", 0)
        assert data.shape[0] == 12  # 2 files x 6 rows

    def test_timestamp_normalization_is_identity_for_ps(self):
        adapter = get_adapter("vx2730")
        ts = np.array([0, 1000, 2000], dtype=np.int64)
        np.testing.assert_array_equal(adapter.normalize_timestamp_to_ps(ts), ts)

    def test_empty_file(self, tmp_path):
        f = tmp_path / "Data_CH0_0.CSV"
        f.write_text("")
        arr = VX2730Reader().read_file(f)
        assert arr.size == 0


class TestV1725:
    def test_parse_roundtrip(self, tmp_path):
        wave0 = np.arange(16, dtype=np.int16) * 10
        wave1 = np.full(24, -5, dtype=np.int16)
        blob = make_v1725_event(
            {0: wave0, 3: wave1},
            timestamps={0: 12345, 3: 67890},
            baselines={0: 100, 3: 200},
        )
        f = tmp_path / "test_raw_b2_seg0.bin"
        f.write_bytes(blob)
        arr = V1725Reader().read_file(f)
        assert len(arr) == 2
        assert arr[0]["board"] == 2
        assert arr[0]["channel"] == 0
        assert arr[0]["timestamp"] == 12345
        assert arr[0]["baseline"] == 100.0
        np.testing.assert_array_equal(arr[0]["wave"], wave0)
        assert arr[1]["channel"] == 3
        np.testing.assert_array_equal(arr[1]["wave"], wave1)

    def test_trunc_flag(self, tmp_path):
        blob = make_v1725_event({0: np.zeros(8, np.int16)}, trunc=True)
        f = tmp_path / "x_b0.bin"
        f.write_bytes(blob)
        arr = V1725Reader().read_file(f)
        assert bool(arr[0]["trunc"]) is True

    def test_multiple_events(self, tmp_path):
        run = write_v1725_run(tmp_path, n_events=5)
        adapter = get_adapter("v1725")
        groups = adapter.scan_run(str(tmp_path), "run_bin")
        files = [p for fs in groups.values() for p in fs]
        arr = V1725Reader().read_files(files)
        assert len(arr) == 10  # 5 events x 2 channels
        # 48-bit timestamps preserved
        assert arr["timestamp"].max() == 1000 + 4 * 500

    def test_sample_index_timestamps_to_ps(self):
        adapter = get_adapter("v1725")
        ts = np.array([0, 1, 250], dtype=np.int64)
        ps = adapter.normalize_timestamp_to_ps(ts)
        np.testing.assert_array_equal(ps, ts * 4000)  # 250 MHz -> 4000 ps

    def test_truncated_file_warns_not_crashes(self, tmp_path):
        blob = make_v1725_event({0: np.zeros(16, np.int16)})
        f = tmp_path / "y_b0.bin"
        f.write_bytes(blob[:20])  # cut mid channel header
        arr = V1725Reader().read_file(f)
        assert arr.size == 0

    def test_48bit_timestamp(self, tmp_path):
        big_ts = (1 << 47) + 12  # needs full 48 bits
        blob = make_v1725_event({0: np.zeros(8, np.int16)}, timestamps={0: big_ts})
        f = tmp_path / "z_b0.bin"
        f.write_bytes(blob)
        arr = V1725Reader().read_file(f)
        assert arr[0]["timestamp"] == big_ts


class TestGenericAdapter:
    def test_custom_csv_adapter(self, tmp_path):
        adapter = make_generic_adapter(
            "my_fmt", delimiter=",", timestamp_unit="ns",
            sampling_rate_hz=1e9,
            columns={"samples_start": 3, "baseline_start": 3, "baseline_end": 5},
            file_glob_pattern="*CH*.txt",
            channel_regex=r"CH(\d+)",
            file_index_regex=r"_(\d+)\.txt$",
            register=True,
        )
        try:
            raw = tmp_path / "runx" / "RAW"
            raw.mkdir(parents=True)
            (raw / "d_CH0_0.txt").write_text("0,0,100,10,20,30\n0,0,200,40,50,60\n")
            groups = adapter.scan_run(str(tmp_path), "runx")
            arr = adapter.format_reader.read_files(groups[0])
            cols = adapter.extract_and_convert(arr)
            np.testing.assert_array_equal(cols["timestamp"], [100_000, 200_000])  # ns->ps
            assert cols["samples"].shape == (2, 3)
            assert is_adapter_registered("my_fmt")
        finally:
            from waveformanalysis_tpu.formats import unregister_adapter

            unregister_adapter("my_fmt")
