"""RecordsView depth: variable-length pools, window slicing, polarity
normalization, padded/device matrix parity (reference analog:
core/data/records_view.py:16-382 zero-copy wave/signal access).
"""

import numpy as np
import pytest

from waveformanalysis_tpu.data.records_view import RecordsView
from waveformanalysis_tpu.dtypes.table import Table


def _var_bundle():
    """3 records with lengths 8 / 4 / 6 in one flat pool."""
    lengths = np.array([8, 4, 6], np.int32)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    pool = np.arange(lengths.sum(), dtype=np.uint16) + 1000
    records = Table({
        "record_id": np.array([10, 20, 30], np.int64),
        "wave_offset": offsets,
        "event_length": lengths,
        "baseline": np.array([1002.0, 1010.0, 1005.0]),
        "polarity": np.array([-1, 1, 0], np.int8),
        "board": np.zeros(3, np.int16),
        "channel": np.arange(3, dtype=np.int16),
        "timestamp": np.array([100, 200, 300], np.int64),
    })
    return RecordsView(records, pool), pool, offsets, lengths


class TestAccess:
    def test_waves_by_record_id(self):
        rv, pool, offsets, lengths = _var_bundle()
        np.testing.assert_array_equal(rv.waves(10), pool[0:8])
        np.testing.assert_array_equal(rv.waves(20), pool[8:12])
        np.testing.assert_array_equal(rv.waves(30), pool[12:18])

    def test_window_slicing(self):
        rv, pool, *_ = _var_bundle()
        np.testing.assert_array_equal(rv.waves(10, window=(2, 5)), pool[2:5])

    def test_unknown_record_raises(self):
        rv, *_ = _var_bundle()
        with pytest.raises(Exception):
            rv.waves(999)

    def test_signals_polarity_normalized(self):
        rv, pool, offsets, lengths = _var_bundle()
        # negative polarity: baseline - wave (positive-going)
        sig_neg = rv.signals(10)
        np.testing.assert_allclose(
            sig_neg, 1002.0 - pool[0:8].astype(np.float64)
        )
        # positive polarity: wave - baseline
        sig_pos = rv.signals(20)
        np.testing.assert_allclose(
            sig_pos, pool[8:12].astype(np.float64) - 1010.0
        )
        # unknown polarity falls back to negative convention
        sig_unk = rv.signals(30)
        np.testing.assert_allclose(
            sig_unk, 1005.0 - pool[12:18].astype(np.float64)
        )

    def test_baseline_lookup(self):
        rv, *_ = _var_bundle()
        assert rv.baseline(20) == 1010.0


class TestPaddedMatrix:
    def test_lengths_and_padding(self):
        rv, pool, offsets, lengths = _var_bundle()
        waves, out_lengths = rv.padded_wave_matrix()
        assert waves.shape[0] == 3
        assert waves.shape[1] % 128 == 0  # lane-width padding
        np.testing.assert_array_equal(out_lengths, lengths)
        for i, (off, ln) in enumerate(zip(offsets, lengths)):
            np.testing.assert_array_equal(waves[i, :ln], pool[off:off + ln])
            assert np.all(waves[i, ln:] == 0)

    def test_pad_to_override(self):
        rv, *_ = _var_bundle()
        waves, _ = rv.padded_wave_matrix(pad_to=16)
        assert waves.shape[1] == 16

    def test_row_subset(self):
        rv, pool, offsets, lengths = _var_bundle()
        waves, out_lengths = rv.padded_wave_matrix(rows=np.array([2, 0]))
        assert waves.shape[0] == 2
        np.testing.assert_array_equal(out_lengths, lengths[[2, 0]])
        np.testing.assert_array_equal(waves[0, :6], pool[12:18])

    def test_device_matrix_matches_host(self):
        rv, *_ = _var_bundle()
        host, host_len = rv.padded_wave_matrix()
        dev, dev_len = rv.padded_wave_matrix_device()
        np.testing.assert_array_equal(
            np.asarray(dev)[:, : host.shape[1]], host
        )
        np.testing.assert_array_equal(np.asarray(dev_len), host_len)

    def test_signal_matrix_zeroes_padding(self):
        rv, pool, offsets, lengths = _var_bundle()
        sig, out_lengths = rv.signal_matrix()
        for i, ln in enumerate(lengths):
            assert np.all(sig[i, ln:] == 0.0)
        # negative-polarity record: positive-going signal
        np.testing.assert_allclose(
            sig[0, :8], (1002.0 - pool[0:8].astype(np.float32)), rtol=1e-6
        )


class TestRoundTripThroughBuilder:
    def test_view_over_built_bundle(self):
        from waveformanalysis_tpu.processing.records_builder import (
            build_records_from_st_waveforms,
        )
        from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms

        st = make_fake_st_waveforms(n_events=12, wave_length=40)
        bundle = build_records_from_st_waveforms(st)
        rv = RecordsView(bundle.records, bundle.wave_pool)
        rid = int(np.asarray(bundle.records["record_id"])[5])
        w = rv.waves(rid)
        assert len(w) == 40
        # the view row matches the source event with the same timestamp
        ts = int(np.asarray(bundle.records["timestamp"])[5])
        src_idx = int(np.flatnonzero(st["timestamp"] == ts)[0])
        np.testing.assert_array_equal(
            w.astype(np.int16), st["wave"][src_idx]
        )
