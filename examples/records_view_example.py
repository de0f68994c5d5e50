#!/usr/bin/env python
"""Minimal RecordsView usage: per-record wave access over the shared pool.

Records keep variable-length waveforms in one contiguous pool addressed by
(wave_offset, event_length); RecordsView gives per-record reads, baseline
correction, window slices and padded device matrices without copying the
pool. (reference analog: examples/records_view.py)
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.data.query import TimeRangeQueryEngine
from waveformanalysis_tpu.data.records_view import RecordsView
from waveformanalysis_tpu.plugins.builtin.records import (
    RecordsPlugin,
    WavePoolPlugin,
)
from waveformanalysis_tpu.plugins.builtin.waveforms import (
    RawFileNamesPlugin,
    WaveformsPlugin,
)
from waveformanalysis_tpu.testing.fixtures import make_synthetic_vx2730_run


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        daq_root = str(Path(tmp) / "daq")
        make_synthetic_vx2730_run(daq_root, run_name="run_001",
                                  n_channels=2, n_rows=64, n_samples=48)

        ctx = Context(
            storage_dir=str(Path(tmp) / "store"),
            config={"data_root": daq_root, "daq_adapter": "vx2730",
                    "n_channels": 2, "show_progress": False},
        )
        ctx.register(RawFileNamesPlugin(), WaveformsPlugin(),
                     RecordsPlugin(), WavePoolPlugin())

        records = ctx.get_data("run_001", "records")
        pool = ctx.get_data("run_001", "wave_pool")
        rv = RecordsView(records, pool)
        print(f"records={len(rv)}")

        first_record_id = int(records["record_id"][0])
        wave0 = rv.waves(first_record_id)
        signal0 = rv.signals(first_record_id, window=(0, 10))
        print("record_id=", first_record_id)
        print("wave0 head:", wave0[:10])
        print("signal0 head:", signal0[:10])
        print("baseline:", rv.baseline(first_record_id))

        # time-window subsetting via the query engine (half-open [lo, hi))
        engine = TimeRangeQueryEngine(ctx)
        lo = int(records["timestamp"].min())
        hi = lo + 1_000_000
        subset = engine.query_time_range("run_001", "records",
                                         start=lo, end=hi,
                                         time_field="timestamp")
        print(f"subset={len(subset)} rows in [{lo}, {hi})")
        ctx.flush_saves()


if __name__ == "__main__":
    main()
