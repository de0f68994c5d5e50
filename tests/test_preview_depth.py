"""WaveformPreviewer depth: ranges, timestamp windows, features, plots.

Behavioral analog of the reference preview suite
(reference: utils/preview.py:181-928): index and timestamp-window loading
with bounded file reads, minimal structuring matching the st_waveforms
conventions, quick feature estimates, and headless plot rendering.
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from waveformanalysis_tpu.testing.fixtures import make_synthetic_vx2730_run
from waveformanalysis_tpu.utils.preview import WaveformPreviewer


@pytest.fixture
def preview(tmp_path):
    make_synthetic_vx2730_run(
        str(tmp_path), run_name="prev_run", n_channels=2,
        n_files_per_channel=2, n_rows=24, n_samples=64,
        pulse_height=220, dt_between_ps=5_000_000,
    )
    return WaveformPreviewer(str(tmp_path), "prev_run")


class TestIndexLoading:
    def test_basic_range(self, preview):
        t = preview.load_events(channel=0, start=0, n_events=8)
        assert len(t) == 8
        assert t["wave"].shape[1] == 64
        assert np.all(np.asarray(t["channel"]) == 0)

    def test_offset_range_continues_across_files(self, preview):
        # 24 rows/file: range [20, 30) spans the file boundary
        t = preview.load_events(channel=0, start=20, n_events=10)
        assert len(t) == 10
        ts = np.asarray(t["timestamp"])
        assert np.all(np.diff(ts) > 0)

    def test_max_files_bounds_work(self, preview):
        t = preview.load_events(channel=0, start=0, n_events=100, max_files=1)
        assert len(t) == 24  # one file's worth only

    def test_other_channel(self, preview):
        t = preview.load_events(channel=1, n_events=4)
        assert np.all(np.asarray(t["channel"]) == 1)

    def test_missing_channel_empty(self, preview):
        t = preview.load_events(channel=9)
        assert len(t) == 0

    def test_structuring_matches_pipeline_conventions(self, preview):
        t = preview.load_events(channel=0, n_events=4)
        # ps timetags, float64 baselines, int32 lengths — st_waveforms shape
        assert np.asarray(t["timestamp"]).dtype == np.int64
        assert np.asarray(t["baseline"]).dtype == np.float64
        assert np.asarray(t["event_length"]).dtype == np.int32
        assert np.all(np.asarray(t["event_length"]) == 64)


class TestTimestampLoading:
    def test_window_selects_expected_events(self, preview):
        full = preview.load_events(channel=0, n_events=48)
        ts = np.asarray(full["timestamp"])
        lo, hi = int(ts[5]), int(ts[12])
        t = preview.load_by_timestamp(channel=0, start_ps=lo, end_ps=hi)
        got = np.asarray(t["timestamp"])
        expected = ts[(ts >= lo) & (ts < hi)]
        np.testing.assert_array_equal(got, expected)

    def test_empty_window(self, preview):
        full = preview.load_events(channel=0, n_events=2)
        ts0 = int(np.asarray(full["timestamp"])[0])
        # a 1-ps window strictly between two 5-ms-spaced timetags
        t = preview.load_by_timestamp(channel=0, start_ps=ts0 + 1,
                                      end_ps=ts0 + 2)
        assert len(t) == 0


class TestFeaturesAndPlots:
    def test_preview_features(self, preview):
        t = preview.load_events(channel=0, n_events=8)
        feats = preview.preview_features(t)
        assert len(feats["height"]) == 8
        # the synthetic pulse is ~220 ADC below a ~1000 baseline
        assert np.all(feats["height"] > 100)

    def test_preview_features_empty(self, preview):
        from waveformanalysis_tpu.dtypes.table import Table

        feats = preview.preview_features(Table({}))
        assert all(len(v) == 0 for v in feats.values())

    def test_plot_overlay_and_grid_render(self, preview):
        t = preview.load_events(channel=0, n_events=6)
        fig1 = preview.plot_overlay(t, max_events=4)
        fig2 = preview.plot_grid(t, n_cols=3)
        assert fig1 is not None and fig2 is not None
        import matplotlib.pyplot as plt

        plt.close("all")


class TestOneStopPreview:
    """Module-level preview_waveforms (reference: utils/preview.py:830)."""

    @pytest.fixture
    def run_root(self, tmp_path):
        make_synthetic_vx2730_run(
            str(tmp_path), run_name="onestop", n_channels=1,
            n_files_per_channel=1, n_rows=12, n_samples=48,
            pulse_height=180, dt_between_ps=4_000_000,
        )
        return str(tmp_path)

    def test_event_range_overlay(self, run_root):
        from waveformanalysis_tpu.utils.preview import preview_waveforms

        fig = preview_waveforms("onestop", 0, event_range=(0, 6),
                                data_root=run_root)
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_timestamp_range_grid_saves(self, run_root, tmp_path):
        from waveformanalysis_tpu.utils.preview import preview_waveforms

        out = tmp_path / "preview.png"
        fig = preview_waveforms(
            "onestop", 0, timestamp_range=(0, 10**12), plot_mode="grid",
            save_path=str(out), data_root=run_root)
        assert fig is not None and out.stat().st_size > 1000
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_requires_exactly_one_range(self, run_root):
        from waveformanalysis_tpu.utils.preview import preview_waveforms

        with pytest.raises(ValueError):
            preview_waveforms("onestop", 0, data_root=run_root)
        with pytest.raises(ValueError):
            preview_waveforms("onestop", 0, event_range=(0, 2),
                              timestamp_range=(0, 1), data_root=run_root)

    def test_invalid_plot_mode(self, run_root):
        from waveformanalysis_tpu.utils.preview import preview_waveforms

        with pytest.raises(ValueError):
            preview_waveforms("onestop", 0, event_range=(0, 2),
                              plot_mode="3d", data_root=run_root)

    def test_annotate_adds_peak_markers(self, preview):
        table = preview.load_events(0, 0, 6)
        ax_plain = preview.plot_overlay(table, annotate=False)
        n_plain = len(ax_plain.lines)
        import matplotlib.pyplot as plt

        plt.close("all")
        ax_annot = preview.plot_overlay(table, annotate=True)
        assert len(ax_annot.lines) > n_plain
        assert "height" in ax_annot.get_title()
        plt.close("all")

    def test_annotate_grid_titles(self, preview):
        table = preview.load_events(0, 0, 4)
        fig = preview.plot_grid(table, annotate=True)
        assert any("h=" in a.get_title() for a in fig.axes)
        import matplotlib.pyplot as plt

        plt.close("all")
