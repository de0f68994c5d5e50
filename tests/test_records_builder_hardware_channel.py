"""Per-hardware-channel splitting in the records builder
(reference: tests/test_records_builder_hardware_channel.py)."""

import numpy as np
import pytest

from waveformanalysis_tpu.dtypes.schema import create_record_dtype
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.hardware import HardwareChannel
from waveformanalysis_tpu.processing.records_builder import (
    split_by_channel,
    split_by_hardware_channel,
)


def _make_st_waveforms() -> np.ndarray:
    dtype = create_record_dtype(8)
    data = np.zeros(2, dtype=dtype)
    data["board"] = [0, 1]
    data["channel"] = [1, 1]
    data["timestamp"] = [10, 20]
    data["baseline"] = 100.0
    data["event_length"] = 8
    data["wave"] = 100
    return data


def test_same_channel_number_on_different_boards_stays_separate():
    groups = split_by_hardware_channel(_make_st_waveforms())
    assert [g[0] for g in groups] == [HardwareChannel(0, 1),
                                      HardwareChannel(1, 1)]
    assert [len(g[1]) for g in groups] == [1, 1]


def test_split_by_channel_rejects_multi_board_input():
    with pytest.raises(ValueError,
                       match="no longer supports multi-board data"):
        split_by_channel(_make_st_waveforms())


def test_split_by_channel_single_board():
    st = _make_st_waveforms()
    st["board"] = 0
    st["channel"] = [3, 1]
    groups = split_by_channel(st)
    # ascending channel order
    assert [ch for ch, _ in groups] == [1, 3]
    assert [int(g["timestamp"][0]) for _, g in groups] == [20, 10]


def test_split_preserves_within_group_order():
    dtype = create_record_dtype(4)
    st = np.zeros(5, dtype=dtype)
    st["board"] = 0
    st["channel"] = [1, 0, 1, 0, 1]
    st["timestamp"] = [5, 1, 7, 2, 3]
    groups = dict(split_by_hardware_channel(st))
    ch1 = groups[HardwareChannel(0, 1)]
    assert list(ch1["timestamp"]) == [5, 7, 3]  # stable (input) order


def test_split_accepts_table_rows():
    tbl = Table({
        "board": np.array([0, 1], np.int16),
        "channel": np.array([1, 1], np.int16),
        "timestamp": np.array([10, 20], np.int64),
    })
    groups = split_by_hardware_channel(tbl)
    assert [g[0] for g in groups] == [HardwareChannel(0, 1),
                                      HardwareChannel(1, 1)]
    assert all(isinstance(g[1], Table) for g in groups)
    assert int(groups[1][1]["timestamp"][0]) == 20


def test_empty_and_invalid_inputs():
    assert split_by_hardware_channel(np.zeros(0, create_record_dtype(4))) == []
    assert split_by_hardware_channel(None) == []
    with pytest.raises(ValueError, match="structured numpy array or Table"):
        split_by_hardware_channel(np.zeros((3, 4)))
    with pytest.raises(ValueError, match="board.*channel|channel.*board"):
        split_by_hardware_channel(Table({"x": np.zeros(3)}))
