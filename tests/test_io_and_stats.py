"""IO helpers + stats collector depth (reference analog: utils/io.py:400-
944 parse_and_stack_files and core/plugins/core/stats.py:103-544).
"""

import numpy as np
import pytest

from utils import create_daq_run
from waveformanalysis_tpu.plugins.stats import PluginStatsCollector, estimate_mb
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.utils.io import parse_and_stack_files


class TestParseAndStack:
    def test_stacks_per_channel(self, tmp_path):
        create_daq_run(tmp_path, "r", n_channels=3, n_files_per_channel=2,
                       n_rows=5, n_samples=16)
        raw_dir = tmp_path / "r" / "RAW"
        raw_files = [
            sorted(str(p) for p in raw_dir.glob(f"*CH{ch}_*.CSV"))
            for ch in range(3)
        ]
        out = parse_and_stack_files(raw_files, daq_adapter="vx2730")
        assert len(out) == 3
        for arr in out:
            assert arr.shape == (10, 23)  # 2 files x 5 rows, 7 + 16 cols

    def test_empty_list(self):
        assert parse_and_stack_files([], daq_adapter="vx2730") == []

    def test_channel_with_no_files_is_none_or_empty(self, tmp_path):
        create_daq_run(tmp_path, "r", n_channels=1, n_rows=3, n_samples=8)
        files = sorted(
            str(p) for p in (tmp_path / "r" / "RAW").glob("*CH0_*.CSV")
        )
        out = parse_and_stack_files([files, []], daq_adapter="vx2730")
        assert out[0] is not None and len(out[0]) == 3
        assert out[1] is None or len(out[1]) == 0


class TestStatsCollector:
    def test_modes(self):
        with pytest.raises(ValueError):
            PluginStatsCollector(mode="loud")
        off = PluginStatsCollector(mode="off")
        assert not off.enabled

    def test_record_and_aggregate(self):
        st = PluginStatsCollector(mode="basic")
        for i in range(4):
            st.record_execution(
                plugin_name="p", run_id=f"r{i}", duration_s=0.1 * (i + 1),
                cache_hit=(i % 2 == 0), success=True, error=None,
            )
        agg = st.get_statistics("p")
        # cache hits are tracked separately from real executions
        assert agg.n_executions == 2
        assert agg.n_cache_hits == 2
        assert abs(agg.cache_hit_rate - 0.5) < 1e-9
        assert agg.avg_duration_s == pytest.approx((0.2 + 0.4) / 2)

    def test_detailed_mode_records_mb(self):
        st = PluginStatsCollector(mode="detailed")
        st.record_execution(
            plugin_name="p", run_id="r", duration_s=0.1, cache_hit=False,
            success=True, error=None, output_mb=12.5,
        )
        rec = st.get_records("p")[0]
        assert rec.output_mb == 12.5

    def test_basic_mode_drops_mb(self):
        st = PluginStatsCollector(mode="basic")
        st.record_execution(
            plugin_name="p", run_id="r", duration_s=0.1, cache_hit=False,
            success=True, error=None, output_mb=12.5,
        )
        assert st.get_records("p")[0].output_mb is None

    def test_estimate_mb(self):
        tbl = Table({"x": np.zeros(10**6, np.int8)})
        assert estimate_mb(tbl) == pytest.approx(1.0, rel=0.01)
        assert estimate_mb(np.zeros(10**6, np.int8)) == pytest.approx(
            1.0, rel=0.01
        )
        assert not estimate_mb(None)

    def test_report_renders(self):
        st = PluginStatsCollector(mode="basic")
        st.record_execution(plugin_name="a", run_id="r", duration_s=0.5,
                            cache_hit=False, success=True, error=None)
        st.record_execution(plugin_name="b", run_id="r", duration_s=0.1,
                            cache_hit=True, success=False, error="x")
        text = st.report()
        assert "a" in text and "b" in text
