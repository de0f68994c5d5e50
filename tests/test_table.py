"""Table / Schema unit tests: structured-array interop, pytree, selection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveformanalysis_tpu.dtypes.schema import (
    BASIC_FEATURES_SCHEMA,
    ST_WAVEFORM_SCHEMA,
    create_record_dtype,
    decode_polarity,
    encode_polarity,
)
from waveformanalysis_tpu.dtypes.table import Table


def make_st_waveforms_np(n=6, wave_len=32, seed=0):
    rng = np.random.default_rng(seed)
    dtype = create_record_dtype(wave_len)
    arr = np.zeros(n, dtype=dtype)
    arr["baseline"] = 1000.0 + rng.normal(0, 1, n)
    arr["polarity"] = "negative"
    arr["timestamp"] = np.arange(n) * 10_000_000
    arr["record_id"] = np.arange(n)
    arr["dt"] = 2
    arr["event_length"] = wave_len
    arr["board"] = 0
    arr["channel"] = np.arange(n) % 2
    arr["wave"] = rng.integers(900, 1100, size=(n, wave_len)).astype(np.int16)
    return arr


class TestSchema:
    def test_numpy_dtype_matches_reference_layout(self):
        dtype = create_record_dtype(1600)
        assert dtype.names == (
            "baseline", "baseline_upstream", "polarity", "timestamp",
            "record_id", "dt", "event_length", "board", "channel", "wave",
        )
        assert dtype["wave"].shape == (1600,)
        assert dtype["baseline"] == np.dtype("f8")
        assert dtype["polarity"] == np.dtype("U8")
        assert dtype["channel"] == np.dtype("i2")

    def test_polarity_codec(self):
        strs = np.array(["positive", "negative", "unknown", "bogus"])
        codes = encode_polarity(strs)
        np.testing.assert_array_equal(codes, [1, -1, 0, 0])
        back = decode_polarity(codes)
        np.testing.assert_array_equal(back, ["positive", "negative", "unknown", "unknown"])


class TestTable:
    def test_roundtrip_structured(self):
        arr = make_st_waveforms_np()
        tbl = Table.from_numpy(arr, schema=ST_WAVEFORM_SCHEMA)
        assert len(tbl) == 6
        assert tbl["polarity"].dtype == np.int8  # encoded
        back = tbl.to_numpy()
        assert back.dtype == arr.dtype
        for name in arr.dtype.names:
            np.testing.assert_array_equal(back[name], arr[name])

    def test_field_access_and_mask_select(self):
        arr = make_st_waveforms_np()
        tbl = Table.from_numpy(arr, schema=ST_WAVEFORM_SCHEMA)
        ch0 = tbl[np.asarray(tbl["channel"]) == 0]
        assert len(ch0) == 3
        assert "wave" in ch0
        assert ch0["wave"].shape == (3, 32)
        assert "channel" in ch0.dtype.names  # structured-array ergonomics

    def test_unequal_lengths_rejected(self):
        with pytest.raises(ValueError):
            Table({"a": np.zeros(3), "b": np.zeros(4)})

    def test_pytree_jit(self):
        arr = make_st_waveforms_np()
        tbl = Table.from_numpy(arr, schema=ST_WAVEFORM_SCHEMA).astype_device()

        @jax.jit
        def shift_baseline(t: Table) -> Table:
            return t.with_columns(baseline=t["baseline"] + 1.0)

        out = shift_baseline(tbl)
        np.testing.assert_allclose(
            np.asarray(out["baseline"]), arr["baseline"] + 1.0
        )
        assert isinstance(out, Table)

    def test_device_roundtrip(self):
        arr = make_st_waveforms_np()
        tbl = Table.from_numpy(arr, schema=ST_WAVEFORM_SCHEMA)
        dev = tbl.astype_device()
        assert isinstance(dev["wave"], jax.Array)
        host = dev.to_host()
        back = host.to_numpy(ST_WAVEFORM_SCHEMA)
        np.testing.assert_array_equal(back["wave"], arr["wave"])
        np.testing.assert_array_equal(back["polarity"], arr["polarity"])

    def test_concatenate_and_sort(self):
        arr = make_st_waveforms_np(4)
        t1 = Table.from_numpy(arr, schema=ST_WAVEFORM_SCHEMA)
        t2 = Table.from_numpy(arr, schema=ST_WAVEFORM_SCHEMA)
        cat = Table.concatenate([t1, t2])
        assert len(cat) == 8
        s = cat.sort_by("timestamp", "record_id")
        ts = np.asarray(s["timestamp"])
        assert np.all(np.diff(ts) >= 0)

    def test_zeros(self):
        tbl = Table.zeros(5, BASIC_FEATURES_SCHEMA)
        assert len(tbl) == 5
        assert tbl["height"].dtype == np.float32
