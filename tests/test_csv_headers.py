"""CSV header handling through the flat-parallel file parser.

Mirrors the reference suite (reference: tests/test_csv_header_handling.py
over utils/io.py parse_and_stack_files / parse_files_generator): the
VX2730 convention is two header rows on a channel's FIRST file only; later
files are headerless. Each test builds real files and checks row counts and
payload values survive the engine chain.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.utils.io import (
    count_rows,
    parse_and_stack_files,
    parse_files_generator,
)

HEADER = "HEADER LINE 1\nHEADER LINE 2\n"


def _rows(n, channel, t0=0, n_samples=8, mark=0):
    out = []
    for i in range(n):
        fields = [0, channel, t0 + i * 1000, 0, 0, 0, 0]
        fields += [1000 + mark] * n_samples
        out.append(";".join(str(x) for x in fields))
    return "\n".join(out) + "\n"


def _write(path, body, header=False):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text((HEADER if header else "") + body)


def test_single_file_with_header(tmp_path):
    f = tmp_path / "Data_CH0_0.CSV"
    _write(f, _rows(5, 0), header=True)
    stacked = parse_and_stack_files([[f]])
    assert stacked[0].shape[0] == 5


def test_multiple_files_header_on_first_only(tmp_path):
    f0 = tmp_path / "Data_CH0_0.CSV"
    f1 = tmp_path / "Data_CH0_1.CSV"
    _write(f0, _rows(4, 0, mark=1), header=True)
    _write(f1, _rows(3, 0, t0=4000, mark=2), header=False)
    stacked = parse_and_stack_files([[f0, f1]])
    assert stacked[0].shape[0] == 7
    # ordering preserved: first file's rows come first (sample col marks)
    assert np.all(stacked[0][:4, 7] == 1001)
    assert np.all(stacked[0][4:, 7] == 1002)


def test_channel_independence(tmp_path):
    """Each channel's first file skips headers independently."""
    a0 = tmp_path / "Data_CH0_0.CSV"
    b0 = tmp_path / "Data_CH1_0.CSV"
    b1 = tmp_path / "Data_CH1_1.CSV"
    _write(a0, _rows(2, 0), header=True)
    _write(b0, _rows(3, 1), header=True)
    _write(b1, _rows(4, 1, t0=3000), header=False)
    stacked = parse_and_stack_files([[a0], [b0, b1]])
    assert stacked[0].shape[0] == 2
    assert stacked[1].shape[0] == 7
    assert np.all(stacked[0][:, 1] == 0)
    assert np.all(stacked[1][:, 1] == 1)


def test_empty_channel_yields_none(tmp_path):
    f = tmp_path / "Data_CH1_0.CSV"
    _write(f, _rows(2, 1), header=True)
    stacked = parse_and_stack_files([[], [f]])
    assert stacked[0] is None
    assert stacked[1].shape[0] == 2


def test_empty_file_skipped(tmp_path):
    f0 = tmp_path / "Data_CH0_0.CSV"
    f1 = tmp_path / "Data_CH0_1.CSV"
    _write(f0, _rows(3, 0), header=True)
    f1.write_text("")
    stacked = parse_and_stack_files([[f0, f1]])
    assert stacked[0].shape[0] == 3


def test_parallel_parse_matches_serial(tmp_path):
    files = []
    for i in range(6):
        f = tmp_path / f"Data_CH0_{i}.CSV"
        _write(f, _rows(5, 0, t0=i * 5000, mark=i), header=(i == 0))
        files.append(f)
    serial = parse_and_stack_files([files], n_jobs=1)
    parallel = parse_and_stack_files([files], n_jobs=4)
    np.testing.assert_array_equal(serial[0], parallel[0])
    assert serial[0].shape[0] == 30


def test_generator_chunks_respect_headers(tmp_path):
    files = []
    for i in range(4):
        f = tmp_path / f"Data_CH0_{i}.CSV"
        _write(f, _rows(2, 0, t0=i * 2000), header=(i == 0))
        files.append(f)
    chunks = list(parse_files_generator([files], chunk_files=2))
    assert [c[0] for c in chunks] == [0, 0]
    assert sum(c[1].shape[0] for c in chunks) == 8


def test_count_rows(tmp_path):
    f0 = tmp_path / "Data_CH0_0.CSV"
    f1 = tmp_path / "Data_CH0_1.CSV"
    _write(f0, _rows(4, 0), header=True)
    _write(f1, _rows(6, 0), header=False)
    assert count_rows([[f0, f1]]) in ([10], 10)


def test_per_engine_parity(tmp_path):
    """Every available engine skips the same header rows."""
    f0 = tmp_path / "Data_CH0_0.CSV"
    f1 = tmp_path / "Data_CH0_1.CSV"
    _write(f0, _rows(3, 0, mark=3), header=True)
    _write(f1, _rows(2, 0, t0=3000, mark=4), header=False)
    baseline = parse_and_stack_files([[f0, f1]], parse_engine="pandas")
    for engine in ("native", "pyarrow"):
        try:
            got = parse_and_stack_files([[f0, f1]], parse_engine=engine)
        except RuntimeError:
            continue  # engine unavailable in this environment
        np.testing.assert_array_equal(baseline[0], got[0])
