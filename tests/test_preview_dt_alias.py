"""Preview dt / deprecated sampling_interval_ns alias
(reference: tests/test_preview_dt_alias.py)."""

import matplotlib

matplotlib.use("Agg")
import numpy as np
import pytest

from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.utils.preview import WaveformPreviewer


def _make_waveforms() -> Table:
    n, L = 4, 16
    rng = np.random.default_rng(0)
    waves = (1000 + rng.normal(0, 2, (n, L))).astype(np.int16)
    return Table({
        "baseline": np.full(n, 1000.0),
        "timestamp": np.arange(n, dtype=np.int64) * 10_000,
        "channel": np.zeros(n, dtype=np.int16),
        "wave": waves,
    })


def _previewer(tmp_path) -> WaveformPreviewer:
    (tmp_path / "run_001" / "RAW").mkdir(parents=True, exist_ok=True)
    return WaveformPreviewer(str(tmp_path), "run_001")


def test_plot_overlay_accepts_dt(tmp_path):
    ax = _previewer(tmp_path).plot_overlay(
        _make_waveforms(), annotate=False, dt=1.5)
    assert ax.lines[0].get_xdata()[1] == pytest.approx(1.5)
    assert ax.get_xlabel() == "time (ns)"


def test_plot_overlay_default_stays_in_samples(tmp_path):
    ax = _previewer(tmp_path).plot_overlay(_make_waveforms(), annotate=False)
    assert ax.lines[0].get_xdata()[1] == pytest.approx(1.0)
    assert ax.get_xlabel() == "sample"


def test_plot_grid_accepts_deprecated_sampling_interval_ns_with_warning(
        tmp_path):
    with pytest.warns(DeprecationWarning, match="sampling_interval_ns"):
        fig = _previewer(tmp_path).plot_grid(
            _make_waveforms(), annotate=False, sampling_interval_ns=3.0)
    assert fig.axes[0].lines[0].get_xdata()[1] == pytest.approx(3.0)


def test_plot_grid_dt_wins_over_deprecated_alias(tmp_path):
    with pytest.warns(DeprecationWarning, match="sampling_interval_ns"):
        fig = _previewer(tmp_path).plot_grid(
            _make_waveforms(), annotate=False, dt=2.0,
            sampling_interval_ns=3.0)
    assert fig.axes[0].lines[0].get_xdata()[1] == pytest.approx(2.0)


def test_plot_overlay_dt_scales_annotated_peaks(tmp_path):
    tbl = _make_waveforms()
    waves = np.asarray(tbl["wave"]).copy()
    waves[:, 7] -= 300  # negative pulse at sample 7
    tbl["wave"] = waves
    ax = _previewer(tmp_path).plot_overlay(tbl, annotate=True, dt=4.0)
    marker_x = ax.lines[-1].get_xdata()
    assert marker_x[0] == pytest.approx(7 * 4.0)
