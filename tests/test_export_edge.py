"""DataExporter edge behavior (reference analog: core/data/export.py:27-230):
ragged JSON encoding, missing parent dirs, overwrite, unknown formats,
Table-vs-DataFrame targets, and batch_export partial failure.
"""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from waveformanalysis_tpu.data.export import DataExporter
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.base import Plugin
from waveformanalysis_tpu.testing.fixtures import make_tiny_context


class TablePlugin(Plugin):
    provides = "tbl_data"
    depends_on = []
    save_when = "never"

    def compute(self, context, run_id, **kwargs):
        return Table({
            "time": np.arange(6, dtype=np.int64),
            "v": np.linspace(0, 1, 6).astype(np.float32),
        })


class RaggedDFPlugin(Plugin):
    provides = "ragged_df"
    depends_on = []
    save_when = "never"

    def compute(self, context, run_id, **kwargs):
        return pd.DataFrame({
            "event_id": [0, 1],
            "channels": [np.array([0, 1]), np.array([2])],
            "areas": [np.array([1.5, 2.5]), np.array([9.0])],
        })


@pytest.fixture()
def ectx(tmp_path):
    ctx = make_tiny_context(tmp_path)
    ctx.register(TablePlugin(), RaggedDFPlugin())
    return ctx


class TestEdgeBehavior:
    def test_missing_parent_dir_created(self, ectx, tmp_path):
        out = tmp_path / "deep" / "nested" / "out.csv"
        DataExporter(ectx).export("r", "tbl_data", str(out), fmt="csv")
        assert out.exists()

    def test_overwrite(self, ectx, tmp_path):
        out = tmp_path / "o.csv"
        ex = DataExporter(ectx)
        ex.export("r", "tbl_data", str(out), fmt="csv")
        first = out.read_text()
        ex.export("r", "tbl_data", str(out), fmt="csv")
        assert out.read_text() == first

    def test_unknown_format_raises(self, ectx, tmp_path):
        with pytest.raises(Exception):
            DataExporter(ectx).export(
                "r", "tbl_data", str(tmp_path / "x.xyz"), fmt="xyz",
            )

    def test_ragged_json_encodes_lists(self, ectx, tmp_path):
        out = tmp_path / "ragged.json"
        DataExporter(ectx).export("r", "ragged_df", str(out), fmt="json")
        payload = json.loads(out.read_text())
        text = json.dumps(payload)
        assert "1.5" in text and "9.0" in text

    def test_ragged_csv_does_not_crash(self, ectx, tmp_path):
        out = tmp_path / "ragged.csv"
        DataExporter(ectx).export("r", "ragged_df", str(out), fmt="csv")
        assert out.exists() and out.stat().st_size > 0

    def test_npz_round_trip(self, ectx, tmp_path):
        out = tmp_path / "t.npz"
        DataExporter(ectx).export("r", "tbl_data", str(out), fmt="npz")
        back = np.load(out)
        np.testing.assert_array_equal(back["time"], np.arange(6))

    def test_batch_export_paths(self, ectx, tmp_path):
        ex = DataExporter(ectx)
        results = ex.batch_export(
            "r", ["tbl_data"], str(tmp_path / "batch"), fmt="csv",
        )
        assert results["tbl_data"].exists()

    def test_batch_export_missing_name_raises(self, ectx, tmp_path):
        with pytest.raises(Exception):
            DataExporter(ectx).batch_export(
                "r", ["not_registered"], str(tmp_path / "b2"), fmt="csv",
            )
