"""Filtering kernel parity tests: device scan IIR + SG conv vs scipy."""

import numpy as np
import pytest
from scipy.signal import savgol_filter, sosfiltfilt

from waveformanalysis_tpu.ops import filtering as FLT


@pytest.fixture
def waves(rng):
    n, L = 8, 256
    t = np.arange(L)
    base = 1000 + 50 * np.sin(2 * np.pi * t / 40)[None, :]
    noise = rng.normal(0, 10, (n, L))
    pulse = np.zeros((n, L))
    for i in range(n):
        s = 60 + i * 5
        pulse[i, s : s + 12] = -300
    return (base + noise + pulse).astype(np.float32)


class TestButterworth:
    def test_design_validation(self):
        with pytest.raises(ValueError):
            FLT.design_butterworth_sos(4, 1e6, 1e5, 500e6)  # low >= high
        with pytest.raises(ValueError):
            FLT.design_butterworth_sos(4, 1e6, 3e8, 500e6)  # high >= nyquist
        with pytest.raises(ValueError):
            FLT.design_butterworth_sos(0, 1e6, 1e8, 500e6)

    def test_zi_matches_scipy(self):
        from scipy.signal import sosfilt_zi as scipy_zi

        sos = FLT.design_butterworth_sos(4, 1e6, 1e8, 500e6)
        np.testing.assert_allclose(FLT.sosfilt_zi(sos), scipy_zi(sos), rtol=1e-9)

    def test_padlen_matches_scipy(self):
        sos = FLT.design_butterworth_sos(3, 5e5, 5e7, 500e6)
        # scipy's internal default for sosfiltfilt
        ntaps = 2 * sos.shape[0] + 1
        expected = 3 * (ntaps - min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum()))
        assert FLT.sosfiltfilt_padlen(sos) == expected

    @pytest.mark.parametrize("order", [2, 4])
    def test_device_matches_scipy(self, waves, order):
        sos = FLT.design_butterworth_sos(order, 1e6, 1e8, 500e6)
        ref = sosfiltfilt(sos, waves.astype(np.float64), axis=-1)
        dev = FLT.sosfiltfilt_device(waves, sos)
        # float32 scan vs float64 scipy: relative tolerance on the signal scale
        scale = np.abs(ref).max()
        np.testing.assert_allclose(dev, ref, atol=2e-3 * scale)

    def test_short_wave_passthrough(self):
        sos = FLT.design_butterworth_sos(4, 1e6, 1e8, 500e6)
        short = np.random.default_rng(0).normal(0, 1, (3, 10)).astype(np.float32)
        out = FLT.sosfiltfilt_device(short, sos)
        np.testing.assert_array_equal(out, short)

    def test_scipy_engine_exact(self, waves):
        sos = FLT.design_butterworth_sos(4, 1e6, 1e8, 500e6)
        ours = FLT.sosfiltfilt_scipy(waves, sos)
        ref = np.asarray(sosfiltfilt(sos, waves, axis=-1), dtype=np.float32)
        np.testing.assert_array_equal(ours, ref)


class TestSavgol:
    @pytest.mark.parametrize("window,poly", [(11, 3), (7, 2), (21, 4)])
    def test_device_matches_scipy(self, waves, window, poly):
        ref = savgol_filter(waves.astype(np.float64), window, poly, axis=-1,
                            mode="interp")
        dev = FLT.savgol_device(waves, window, poly)
        np.testing.assert_allclose(dev, ref, atol=2e-2)

    def test_even_window_clamped(self, waves):
        dev = FLT.savgol_device(waves, 12, 3)  # clamps to 11
        ref = savgol_filter(waves.astype(np.float64), 11, 3, axis=-1, mode="interp")
        np.testing.assert_allclose(dev, ref, atol=2e-2)

    def test_window_leq_poly_passthrough(self, waves):
        out = FLT.savgol_device(waves, 3, 3)
        np.testing.assert_array_equal(out, waves)

    def test_window_larger_than_wave(self):
        w = np.random.default_rng(1).normal(0, 1, (2, 9)).astype(np.float32)
        dev = FLT.savgol_device(w, 21, 3)  # clamps to 9
        ref = savgol_filter(w.astype(np.float64), 9, 3, axis=-1, mode="interp")
        np.testing.assert_allclose(dev, ref, atol=2e-2)


class TestApplyFilter:
    def test_dispatch(self, waves):
        sos = FLT.design_butterworth_sos(4, 1e6, 1e8, 500e6)
        out = FLT.apply_filter(waves, "BW", bw_sos=sos)
        assert out.dtype == np.float32
        out2 = FLT.apply_filter(waves, "SG", sg_window_size=11, sg_poly_order=3)
        assert out2.shape == waves.shape
        with pytest.raises(ValueError, match="Unsupported filter type"):
            FLT.apply_filter(waves, "XX")

    def test_filter_pool_roundtrip(self):
        from waveformanalysis_tpu.data.records_view import RecordsView
        from waveformanalysis_tpu.dtypes.table import Table

        rng = np.random.default_rng(2)
        lengths = np.array([64, 128, 96], dtype=np.int32)
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
        pool = rng.integers(800, 1200, int(lengths.sum())).astype(np.uint16)
        records = Table({
            "wave_offset": offsets,
            "event_length": lengths,
            "record_id": np.arange(3, dtype=np.int64),
            "baseline": np.full(3, 1000.0),
            "polarity": np.full(3, -1, dtype=np.int8),
            "board": np.zeros(3, np.int16),
            "channel": np.zeros(3, np.int16),
        })
        view = RecordsView(records, pool)
        out = FLT.filter_pool(view, "savgol",
                              {"sg_window_size": 7, "sg_poly_order": 2})
        assert out.dtype == np.float32
        assert len(out) == int(lengths.sum())
        # each record individually matches scipy on its true extent
        for i in range(3):
            w = pool[offsets[i]:offsets[i]+lengths[i]].astype(np.float32)
            ref = savgol_filter(w.astype(np.float64), 7, 2, mode="interp")
            np.testing.assert_allclose(
                out[offsets[i]:offsets[i]+lengths[i]], ref, atol=2e-2
            )


def test_filtered_cache_reload_keeps_float32(tmp_path):
    """Regression (round-4 differential oracle): the filtered schema kept
    the st_waveforms schema NAME, so a disk-cache reload re-attached the st
    schema and floored the f4 waves back to int16."""
    import numpy as np

    from waveformanalysis_tpu.context.context import Context
    from waveformanalysis_tpu.plugins.builtin.filtering import (
        FilteredWaveformsPlugin,
    )
    from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms

    store = str(tmp_path / "s")
    st = make_fake_st_waveforms(n_events=8, wave_length=64, noise_rms=3.0)

    ctx1 = Context(storage_dir=store, config={"show_progress": False})
    ctx1.register(FilteredWaveformsPlugin())
    ctx1.inject_data("r", "st_waveforms", st)
    fresh = ctx1.get_data("r", "filtered_waveforms").to_numpy()
    ctx1.flush_saves()
    assert fresh["wave"].dtype == np.float32
    assert not np.array_equal(fresh["wave"], fresh["wave"].astype(np.int16))

    ctx2 = Context(storage_dir=store, config={"show_progress": False})
    ctx2.register(FilteredWaveformsPlugin())
    ctx2.inject_data("r", "st_waveforms", st)
    reloaded = ctx2.get_data("r", "filtered_waveforms").to_numpy()
    assert reloaded["wave"].dtype == np.float32
    np.testing.assert_array_equal(reloaded["wave"], fresh["wave"])
