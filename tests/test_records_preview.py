"""plot_records_waveforms suite (reference analog: tests/test_records_preview.py
over waveform_analysis/utils/preview.py:912 plot_records_waveforms)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from waveformanalysis_tpu.data.records_view import RecordsView
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.utils.preview import plot_records_waveforms


def _make_records_view() -> RecordsView:
    n, L = 6, 8
    cols = {
        "record_id": np.array([101, 102, 103, 104, 105, 106], np.int64),
        "timestamp": (np.arange(n, dtype=np.int64) + 1) * 1000,
        "board": np.array([0, 0, 0, 1, 1, 1], np.int16),
        "channel": np.array([1, 1, 2, 2, 3, 3], np.int16),
        "baseline": np.full(n, 100.0),
        "polarity": np.full(n, -1, np.int8),  # negative: signal = bl - wave
        "dt": np.full(n, 2, np.int32),
        "wave_offset": np.arange(n, dtype=np.int64) * L,
        "event_length": np.full(n, L, np.int32),
    }
    pool = np.full(n * L, 100, np.uint16)
    for i in range(n):
        # dip depth grows with the record: heights 10, 20, ..., 60
        pool[i * L + 3] = 100 - 10 * (i + 1)
    return RecordsView(Table(cols), pool)


class TestExplicitRecordIds:
    def test_accepts_single_and_list(self):
        rv = _make_records_view()
        fig = plot_records_waveforms(rv, record_ids=103)
        assert len(fig.axes) >= 1
        fig2 = plot_records_waveforms(rv, record_ids=[101, 104, 106])
        titles = [ax.get_title() for ax in fig2.axes if ax.get_title()]
        assert [t.split()[1] for t in titles] == ["101", "104", "106"]

    def test_preserves_given_order(self):
        rv = _make_records_view()
        fig = plot_records_waveforms(rv, record_ids=[105, 101, 103])
        titles = [ax.get_title() for ax in fig.axes if ax.get_title()]
        assert [t.split()[1] for t in titles] == ["105", "101", "103"]

    def test_unknown_record_id_raises(self):
        rv = _make_records_view()
        with pytest.raises(KeyError, match="999"):
            plot_records_waveforms(rv, record_ids=[101, 999])


class TestFilters:
    def test_board_channel_filters(self):
        rv = _make_records_view()
        fig = plot_records_waveforms(rv, board=1, channel=3)
        titles = [ax.get_title() for ax in fig.axes if ax.get_title()]
        assert [t.split()[1] for t in titles] == ["105", "106"]

    def test_timestamp_range_inclusive(self):
        rv = _make_records_view()
        fig = plot_records_waveforms(rv, timestamp_range=(2000, 4000))
        titles = [ax.get_title() for ax in fig.axes if ax.get_title()]
        assert [t.split()[1] for t in titles] == ["102", "103", "104"]

    def test_height_filter(self):
        rv = _make_records_view()
        # heights are 10..60; keep [25, 45] -> records 103, 104
        fig = plot_records_waveforms(rv, height_range=(25, 45))
        titles = [ax.get_title() for ax in fig.axes if ax.get_title()]
        assert [t.split()[1] for t in titles] == ["103", "104"]

    def test_area_filter(self):
        rv = _make_records_view()
        # area == height here (single dipped sample)
        fig = plot_records_waveforms(rv, area_range=(55, 100))
        titles = [ax.get_title() for ax in fig.axes if ax.get_title()]
        assert [t.split()[1] for t in titles] == ["106"]

    def test_limit_caps_selection(self):
        rv = _make_records_view()
        fig = plot_records_waveforms(rv, limit=2)
        titles = [ax.get_title() for ax in fig.axes if ax.get_title()]
        assert len(titles) == 2

    def test_empty_query_renders_placeholder(self):
        rv = _make_records_view()
        fig = plot_records_waveforms(rv, height_range=(1000, 2000))
        assert fig is not None
        texts = [t.get_text() for ax in fig.axes for t in ax.texts]
        assert any("no records" in t for t in texts)


class TestRenderingOptions:
    def test_window_changes_metrics(self):
        rv = _make_records_view()
        # window excluding sample 3 -> flat signal, height 0
        fig = plot_records_waveforms(rv, record_ids=[101],
                                     sample_start=4, sample_end=8)
        title = [ax.get_title() for ax in fig.axes if ax.get_title()][0]
        assert "h=0.0" in title

    def test_dt_scales_time_axis(self):
        rv = _make_records_view()
        fig = plot_records_waveforms(rv, record_ids=[101], dt=4.0)
        line = fig.axes[0].lines[0]
        assert line.get_xdata()[-1] == pytest.approx(4.0 * 7)

    def test_dt_defaults_to_records_dt(self):
        rv = _make_records_view()
        fig = plot_records_waveforms(rv, record_ids=[101])
        line = fig.axes[0].lines[0]
        assert line.get_xdata()[-1] == pytest.approx(2.0 * 7)

    def test_save_path_writes_file(self, tmp_path):
        rv = _make_records_view()
        out = tmp_path / "records.png"
        plot_records_waveforms(rv, record_ids=[101], save_path=str(out))
        assert out.exists() and out.stat().st_size > 0

    def test_title_and_toggles(self):
        rv = _make_records_view()
        fig = plot_records_waveforms(rv, record_ids=[101], title="hello",
                                     show_baseline=False, show_peak=False)
        assert fig._suptitle.get_text() == "hello"
        assert fig.axes[0].get_legend() is None


class TestContextSource:
    def test_context_like_source(self, tmp_path):
        rv = _make_records_view()

        class FakeCtx:
            def get_data(self, run_id, name):
                assert run_id == "r1"
                return {"records": rv.records,
                        "wave_pool": rv.wave_pool}[name]

        fig = plot_records_waveforms(FakeCtx(), run_id="r1",
                                     record_ids=[102])
        titles = [ax.get_title() for ax in fig.axes if ax.get_title()]
        assert titles and "102" in titles[0]

    def test_context_without_run_id_raises(self):
        class FakeCtx:
            def get_data(self, run_id, name):  # pragma: no cover
                raise AssertionError

        with pytest.raises(ValueError, match="run_id"):
            plot_records_waveforms(FakeCtx())

    def test_bad_source_raises(self):
        with pytest.raises(TypeError, match="RecordsView or Context"):
            plot_records_waveforms(42)
