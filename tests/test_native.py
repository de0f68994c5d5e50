"""Native C++ CSV decoder: parity with the pyarrow engine + edge cases.

The decoder (waveformanalysis_tpu/native/csv_decode.cpp) is the default
VX2730 parse engine; these tests pin its contract: numeric parity with the
pyarrow path on well-formed files, documented handling of malformed rows,
and graceful fallback when the native library is unavailable.
"""

from pathlib import Path

import numpy as np
import pytest

from utils import create_daq_run

from waveformanalysis_tpu.formats.vx2730 import VX2730Reader
from waveformanalysis_tpu.native import decode_csv_bytes, get_lib

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def test_parity_with_pyarrow_on_synthetic_run(tmp_path):
    create_daq_run(tmp_path, "r", n_channels=2, n_rows=200, n_samples=32)
    rd = VX2730Reader()
    for f in sorted((tmp_path / "r" / "RAW").glob("*.CSV")):
        a = rd.read_file(f, is_first_file=True, parse_engine="native")
        b = rd.read_file(f, is_first_file=True, parse_engine="pyarrow")
        assert a.shape == b.shape
        assert np.array_equal(a, b, equal_nan=True)


def test_floats_exponents_and_signs():
    out = decode_csv_bytes(b"1.5;-2;+3\n-4.25e2;0;7\n", skip_rows=0)
    assert out.tolist() == [[1.5, -2.0, 3.0], [-425.0, 0.0, 7.0]]


def test_skip_rows_and_blank_lines():
    out = decode_csv_bytes(b"header\njunk;x\n1;2\n\n3;4\n", skip_rows=2)
    assert out.tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_malformed_rows_skipped_trailing_delim_ok():
    # column count fixed by the first data row; short/long rows drop;
    # a trailing delimiter does not open a field
    data = b"1;2;3\n1;2\n1;2;3;4\n4;5;6;\n;;\n"
    out = decode_csv_bytes(data, skip_rows=0)
    assert out.tolist() == [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]


def test_empty_fields_are_nan():
    out = decode_csv_bytes(b"1;;3\n", skip_rows=0)
    assert out.shape == (1, 3)
    assert np.isnan(out[0, 1]) and out[0, 2] == 3.0


def test_no_trailing_newline():
    out = decode_csv_bytes(b"1;2\n3;4", skip_rows=0)
    assert out.tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_large_int64_timestamps_exact():
    # ps timestamps exceed float64's 2^53 integer range; the digit
    # accumulator is exact, so the double is the nearest representable —
    # identical to pyarrow's int64 -> float64 cast
    ts = 2**60 + 12345
    out = decode_csv_bytes(f"{ts};1\n".encode(), skip_rows=0)
    assert out[0, 0] == float(np.int64(ts))


def test_empty_and_headers_only():
    assert decode_csv_bytes(b"", skip_rows=0).shape == (0, 0)
    assert decode_csv_bytes(b"h1\nh2\n", skip_rows=2).shape == (0, 0)


def test_reader_auto_prefers_native(tmp_path, monkeypatch):
    create_daq_run(tmp_path, "r", n_channels=1, n_rows=10, n_samples=8)
    f = next((tmp_path / "r" / "RAW").glob("*.CSV"))
    rd = VX2730Reader()
    called = {}
    orig = rd._read_native

    def spy(path, skiprows):
        called["native"] = True
        return orig(path, skiprows)

    monkeypatch.setattr(rd, "_read_native", spy)
    rd.read_file(f, is_first_file=True)
    assert called.get("native")


class TestV1725Native:
    def _write_run(self, tmp_path, n_events=200, trunc_tail=False):
        from utils import make_v1725_event

        rng = np.random.default_rng(1)
        blobs = []
        for i in range(n_events):
            w = (1000 + rng.integers(-3, 4, 32)).astype(np.int16)
            blobs.append(make_v1725_event(
                {0: w, 2: (w - 5).astype(np.int16)},
                timestamps={0: i * 777, 2: i * 777 + 3},
                baselines={0: 990, 2: 991},
                trunc=(i % 5 == 0),
            ))
        data = b"".join(blobs)
        if trunc_tail:
            data = data[:-13]
        f = tmp_path / "wave_b2.bin"
        f.write_bytes(data)
        return f

    @pytest.mark.parametrize("trunc_tail", [False, True])
    def test_parity_with_python_reader(self, tmp_path, trunc_tail):
        from unittest import mock

        from waveformanalysis_tpu.processing import records_builder as rb

        f = self._write_run(tmp_path, trunc_tail=trunc_tail)
        b_native = rb.build_records_from_v1725_files([str(f)], default_dt_ns=4)
        with mock.patch("waveformanalysis_tpu.native.get_lib",
                        return_value=None):
            b_py = rb.build_records_from_v1725_files([str(f)],
                                                     default_dt_ns=4)
        hn, hp = b_native.records.to_host(), b_py.records.to_host()
        assert len(hn) == len(hp) > 0
        for k in hn.columns:
            assert np.array_equal(np.asarray(hn[k]), np.asarray(hp[k]),
                                  equal_nan=True), k
        assert np.array_equal(b_native.wave_pool, b_py.wave_pool)

    def test_negative_samples_wrap_like_int16_view(self, tmp_path):
        from utils import make_v1725_event

        from waveformanalysis_tpu.native import decode_v1725_bytes

        w = np.array([-1, -32768, 32767, 0], dtype=np.int16)
        data = make_v1725_event({1: w}, timestamps={1: 42})
        dec = decode_v1725_bytes(data)
        assert dec["timestamp"].tolist() == [42]
        assert np.array_equal(dec["wave_pool"], w.view(np.uint16))

    def test_empty_buffer(self):
        from waveformanalysis_tpu.native import decode_v1725_bytes

        dec = decode_v1725_bytes(b"")
        assert len(dec["channel"]) == 0 and len(dec["wave_pool"]) == 0


def test_fallback_when_native_unavailable(tmp_path, monkeypatch):
    create_daq_run(tmp_path, "r", n_channels=1, n_rows=10, n_samples=8)
    f = next((tmp_path / "r" / "RAW").glob("*.CSV"))
    rd = VX2730Reader()
    monkeypatch.setattr(rd, "_read_native", lambda *a, **k: None)
    out = rd.read_file(f, is_first_file=True)  # falls through to pyarrow
    assert out.shape[0] == 10


def test_fuzz_decoders_do_not_crash():
    """Bounded in-process fuzz: random + structured-random buffers must
    never crash the C decoders (full ASAN/UBSAN sweep: scripts/fuzz_native.cpp)."""
    rng = np.random.default_rng(123)
    from waveformanalysis_tpu.native import decode_v1725_bytes

    alphabet = b"0123456789;.-+e\n\r "
    for i in range(60):
        n = int(rng.integers(0, 2000))
        raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        structured = bytes(alphabet[j]
                           for j in rng.integers(0, len(alphabet), n))
        for data in (raw, structured):
            out = decode_csv_bytes(data, skip_rows=int(rng.integers(0, 3)))
            assert out is None or out.ndim == 2
            dec = decode_v1725_bytes(data)
            assert dec is None or len(dec["wave_offset"]) == len(dec["channel"])
