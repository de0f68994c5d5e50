"""DAQ analyzer display surfaces: overview tables, channel details, JSON.

Behavioral analog of the reference display tests
(reference: tests/test_display_run_channel_details.py and the ANSI/HTML
rendering layers in utils/daq/daq_analyzer.py:83-427).
"""

import json

import numpy as np
import pytest

from waveformanalysis_tpu.testing.fixtures import make_synthetic_vx2730_run
from waveformanalysis_tpu.utils.daq import (
    DAQAnalyzer,
    DAQRun,
    format_size,
    format_time_ps,
)


@pytest.fixture
def data_root(tmp_path):
    make_synthetic_vx2730_run(str(tmp_path), run_name="disp_run",
                              n_channels=2, n_rows=16)
    make_synthetic_vx2730_run(str(tmp_path), run_name="disp_run_b",
                              n_channels=3, n_rows=8, seed=1)
    return str(tmp_path)


class TestFormatters:
    def test_format_size_units(self):
        assert format_size(10) == "10 B"
        assert format_size(2048) == "2.0 KB"
        assert format_size(5 * 1024 * 1024) == "5.0 MB"
        assert format_size(3 * 1024 ** 3) == "3.0 GB"

    def test_format_time_ps_scales(self):
        assert format_time_ps(None) == "-"
        assert "ns" in format_time_ps(500)
        assert "us" in format_time_ps(5_000_000)
        assert "ms" in format_time_ps(5_000_000_000)
        assert format_time_ps(2_500_000_000_000) == "2.500 s"
        assert "min" in format_time_ps(400 * 10 ** 12)


class TestDisplayRunChannelDetails:
    def test_prints_and_chains(self, data_root, capsys):
        analyzer = DAQAnalyzer(data_root).scan_all_runs()
        result = analyzer.display_run_channel_details("disp_run")
        assert result is analyzer  # chainable, reference contract
        out = capsys.readouterr().out
        assert "disp_run" in out
        assert "2 channels" in out

    def test_show_files_lists_every_file(self, data_root, capsys):
        analyzer = DAQAnalyzer(data_root)
        analyzer.display_run_channel_details("disp_run", show_files=True)
        out = capsys.readouterr().out
        assert "Data_CH0" in out and "Data_CH1" in out

    def test_color_disabled_has_no_ansi(self, data_root, capsys):
        DAQAnalyzer(data_root).display_run_channel_details(
            "disp_run", color=False
        )
        out = capsys.readouterr().out
        assert "\x1b[" not in out

    def test_color_enabled_has_ansi(self, data_root, capsys):
        DAQAnalyzer(data_root).display_run_channel_details(
            "disp_run", color=True
        )
        assert "\x1b[" in capsys.readouterr().out


class TestDisplayOverview:
    def test_ansi_table_lists_all_runs(self, data_root):
        text = DAQAnalyzer(data_root).display_overview(color=False)
        assert "disp_run" in text and "disp_run_b" in text
        assert "\x1b[" not in text

    def test_html_table(self, data_root):
        html = DAQAnalyzer(data_root).display_overview(html=True)
        assert html.startswith("<table>")
        assert "disp_run" in html and "<th>channels</th>" in html

    def test_save_to_json_round_trip(self, data_root, tmp_path):
        path = tmp_path / "daq.json"
        DAQAnalyzer(data_root).save_to_json(str(path))
        payload = json.loads(path.read_text())
        assert set(payload["runs"]) == {"disp_run", "disp_run_b"}
        ch0 = payload["runs"]["disp_run"]["channels"]["0"]
        assert ch0["n_files"] == 1 and ch0["total_bytes"] > 0


class TestAcquisitionAnalysis:
    def test_compute_acquisition_times(self, data_root):
        run = DAQRun(data_root, "disp_run")
        times = run.compute_acquisition_times()
        assert set(times) == {0, 1}
        for ch, info in times.items():
            assert info["first_timetag_ps"] is not None
            assert info["last_timetag_ps"] >= info["first_timetag_ps"]
            assert info["duration_s"] >= 0
            assert info["n_files"] == 1
            if info["duration_s"]:
                assert info["sampled_event_rate_hz"] > 0

    def test_run_acquisition_window_spans_channels(self, data_root):
        run = DAQRun(data_root, "disp_run")
        lo, hi = run.get_run_acquisition_window()
        stats = run.channel_stats()
        assert lo == min(s.first_timetag_ps for s in stats.values())
        assert hi == max(s.last_timetag_ps for s in stats.values())

    def test_channel_file_details(self, data_root):
        run = DAQRun(data_root, "disp_run")
        details = run.get_channel_file_details(0)
        assert details and details[0]["name"].startswith("Data_CH0")
        assert details[0]["size"] > 0
        assert run.get_channel_file_details(99) is None

    def test_missing_run_is_empty(self, tmp_path):
        run = DAQRun(str(tmp_path), "nope")
        assert run.channels == []
        assert run.get_run_acquisition_window() == (None, None)
        assert run.compute_acquisition_times() == {}
