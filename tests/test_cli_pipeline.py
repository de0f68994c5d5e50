"""End-to-end `waveform-process` CLI tests on a synthetic run
(reference analog: cli.py:23-230 pipeline path and its tests).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from utils import create_daq_run
from waveformanalysis_tpu.cli import main as cli_main


@pytest.fixture()
def daq(tmp_path):
    create_daq_run(tmp_path / "DAQ", "run_cli", n_channels=2, n_rows=16,
                   n_samples=48, pulse_height=-300)
    return tmp_path


def _base_args(daq, tmp_path, *extra):
    return [
        "--run-name", "run_cli",
        "--data-root", str(daq / "DAQ"),
        "--storage-dir", str(tmp_path / "cli_storage"),
        "--n-channels", "2",
        "--quiet",
        *extra,
    ]


class TestProcessCLI:
    def test_full_pipeline_to_csv(self, daq, tmp_path, capsys):
        out_csv = tmp_path / "out" / "events.csv"
        rc = cli_main(_base_args(
            daq, tmp_path, "--target", "df_events",
            "--output", str(out_csv),
        ))
        assert rc == 0
        assert out_csv.exists()
        text = out_csv.read_text()
        assert "event_id" in text.splitlines()[0]
        assert len(text.splitlines()) > 1

    def test_parquet_output(self, daq, tmp_path):
        out_pq = tmp_path / "out" / "events.parquet"
        rc = cli_main(_base_args(
            daq, tmp_path, "--target", "df", "--output", str(out_pq),
        ))
        assert rc == 0
        import pandas as pd

        df = pd.read_parquet(out_pq)
        assert len(df) == 32  # 2 channels x 16 rows

    def test_scan_daq(self, daq, tmp_path, capsys):
        rc = cli_main(_base_args(daq, tmp_path, "--scan-daq"))
        assert rc == 0
        out = capsys.readouterr().out
        assert "channel 0" in out and "files" in out

    def test_show_daq(self, daq, tmp_path, capsys):
        """--show-daq renders the per-channel overview table
        (reference: tests/test_cli_show_daq.py,
        tests/test_display_run_channel_details.py)."""
        rc = cli_main(_base_args(daq, tmp_path, "--show-daq"))
        assert rc == 0
        out = capsys.readouterr().out
        assert "DAQ run:" in out
        assert "adapter: vx2730" in out
        assert "size(MB)" in out and "window(s)" in out

    def test_daq_inspection_requires_run_name(self, daq, tmp_path, capsys):
        args = _base_args(daq, tmp_path, "--show-daq")
        args = [a for i, a in enumerate(args)
                if a != "--run-name" and (i == 0 or args[i - 1] != "--run-name")]
        rc = cli_main(args)
        assert rc == 2
        assert "run-name" in capsys.readouterr().err

    def test_show_config(self, daq, tmp_path, capsys):
        rc = cli_main(_base_args(daq, tmp_path, "--show-config"))
        assert rc == 0
        out = capsys.readouterr().out
        assert "data_root" in out

    def test_preview_does_not_compute(self, daq, tmp_path, capsys):
        rc = cli_main(_base_args(
            daq, tmp_path, "--target", "df_events", "--preview",
        ))
        assert rc == 0
        out = capsys.readouterr().out
        assert "df_events" in out
        # preview must not have produced cache files for the target
        storage = tmp_path / "cli_storage"
        assert not list(storage.rglob("*df_events*.bin"))

    def test_config_json_roundtrip(self, daq, tmp_path):
        cfg = tmp_path / "cfg.json"
        cfg.write_text(json.dumps({
            "hit_threshold": {"threshold": 123.0},
        }))
        rc = cli_main(_base_args(
            daq, tmp_path, "--target", "basic_features",
            "--config-json", str(cfg),
        ))
        assert rc == 0

    def test_missing_run_errors(self, daq, tmp_path, capsys):
        rc = cli_main([
            "--run-name", "nope",
            "--data-root", str(daq / "DAQ"),
            "--storage-dir", str(tmp_path / "s2"),
            "--quiet",
        ])
        assert rc != 0

    def test_second_invocation_uses_cache(self, daq, tmp_path, capsys):
        args = _base_args(daq, tmp_path, "--target", "basic_features")
        assert cli_main(args) == 0
        # second run over the same storage: loads from cache (fast path);
        # just assert it succeeds and produces identical row counts
        assert cli_main(args) == 0
