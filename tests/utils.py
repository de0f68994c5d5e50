"""Shared test helpers: synthetic DAQ runs, CSV/binary factories, fake contexts.

Reference analog: tests/utils.py (DummyContext, make_csv*, structured-array
factories, register_test_adapter).
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

VX_HEADER = "HEADER LINE 1\nHEADER LINE 2\n"


def make_vx2730_csv_rows(
    n_rows: int,
    channel: int,
    board: int = 0,
    n_samples: int = 48,
    t0: int = 0,
    dt_between: int = 10_000_000,  # ps between events
    baseline: int = 1000,
    pulse_height: int = 200,
    pulse_start: int = 45,  # absolute column; samples start at col 7
    seed: int = 0,
) -> List[str]:
    """Rows in VX2730 CSV layout: board;channel;timetag;c3;c4;c5;c6;samples..."""
    rng = np.random.default_rng(seed + channel)
    rows = []
    for i in range(n_rows):
        ts = t0 + i * dt_between
        samples = np.full(n_samples, baseline) + rng.integers(-3, 4, n_samples)
        p = pulse_start - 7
        if 0 <= p < n_samples:
            samples[p : p + 5] -= pulse_height
        fields = [board, channel, ts, 0, 0, 0, 0] + list(samples)
        rows.append(";".join(str(int(x)) for x in fields))
    return rows


def write_vx2730_file(
    path: Path, rows: Sequence[str], with_header: bool = True
) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    text = (VX_HEADER if with_header else "") + "\n".join(rows) + "\n"
    path.write_text(text)


def create_daq_run(
    data_root: Path,
    run_name: str = "run_001",
    n_channels: int = 2,
    n_files_per_channel: int = 1,
    n_rows: int = 12,
    n_samples: int = 48,
    **row_kwargs: Any,
) -> Path:
    """Synthetic VX2730 run directory tree:
    {data_root}/{run}/RAW/xxx_CH{c}_{i}.CSV (reference: tests/conftest.py:39)."""
    raw = data_root / run_name / "RAW"
    for ch in range(n_channels):
        for fi in range(n_files_per_channel):
            rows = make_vx2730_csv_rows(
                n_rows, channel=ch, n_samples=n_samples,
                t0=fi * n_rows * row_kwargs.get("dt_between", 10_000_000),
                **row_kwargs,
            )
            write_vx2730_file(
                raw / f"Data_CH{ch}_{fi}.CSV", rows, with_header=(fi == 0)
            )
    return data_root / run_name


def make_v1725_event(
    channels_waves: Dict[int, np.ndarray],
    timestamps: Optional[Dict[int, int]] = None,
    baselines: Optional[Dict[int, int]] = None,
    trunc: bool = False,
) -> bytes:
    """One V1725 DAW_DEMO event blob: 16-byte event header + per-channel
    (12-byte header + int16 samples)."""
    timestamps = timestamps or {}
    baselines = baselines or {}
    mask = 0
    for ch in channels_waves:
        mask |= 1 << ch
    header = bytearray(16)
    header[4] = mask & 0xFF
    header[11] = (mask >> 8) & 0xFF
    out = bytes(header)
    for ch in sorted(channels_waves):
        wave = np.asarray(channels_waves[ch], dtype="<i2")
        if len(wave) % 2:
            raise ValueError("v1725 waves must have an even number of samples")
        size_words = 3 + (wave.nbytes // 4)
        ts = timestamps.get(ch, 0)
        bl = baselines.get(ch, 0)
        ch_header = bytearray(12)
        ch_header[0:3] = (size_words & ((1 << 22) - 1)).to_bytes(3, "little")
        if trunc:
            ch_header[3] |= 1 << 6
        ch_header[4:10] = ts.to_bytes(6, "little")
        ch_header[10:12] = bl.to_bytes(2, "little")
        out += bytes(ch_header) + wave.tobytes()
    return out


def write_v1725_run(
    data_root: Path,
    run_name: str = "run_bin",
    n_events: int = 4,
    n_samples: int = 32,
    board: int = 0,
) -> Path:
    raw = data_root / run_name / "RAW"
    raw.mkdir(parents=True, exist_ok=True)
    blob = b""
    for i in range(n_events):
        wave0 = np.full(n_samples, 900, dtype=np.int16)
        wave0[10:14] -= 150
        wave1 = np.full(n_samples, 1100, dtype=np.int16)
        wave1[12:18] -= 300
        blob += make_v1725_event(
            {0: wave0, 1: wave1},
            timestamps={0: 1000 + i * 500, 1: 1000 + i * 500},
            baselines={0: 900, 1: 1100},
        )
    (raw / f"test_raw_b{board}_seg0.bin").write_bytes(blob)
    return data_root / run_name
