#!/usr/bin/env python
"""Records pipeline: raw DAQ CSV run -> records/wave_pool -> features -> df.

The records path keeps variable-length waveforms in one contiguous pool
addressed by (wave_offset, event_length), so downstream plugins read from a
single padded device matrix instead of per-file arrays.
(reference analog: examples/records_pipeline_example.py)
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.dataframe import DataFramePlugin
from waveformanalysis_tpu.plugins.builtin.records import RecordsPlugin, WavePoolPlugin
from waveformanalysis_tpu.plugins.builtin.waveforms import (
    RawFileNamesPlugin,
    WaveformsPlugin,
)
from waveformanalysis_tpu.testing.fixtures import make_synthetic_vx2730_run


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        daq_root = str(Path(tmp) / "daq")
        make_synthetic_vx2730_run(
            daq_root, run_name="run_001", n_channels=2,
            n_files_per_channel=2, n_rows=64, n_samples=48,
        )

        ctx = Context(
            storage_dir=str(Path(tmp) / "store"),
            config={"data_root": daq_root, "daq_adapter": "vx2730",
                    "show_progress": False},
        )
        ctx.register(RawFileNamesPlugin(), WaveformsPlugin(), RecordsPlugin(),
                     WavePoolPlugin(), BasicFeaturesPlugin(), DataFramePlugin())
        # read features straight off the records pool (no st_waveforms pass)
        ctx.set_config({"basic_features": {"wave_source": "records"}})

        records = ctx.get_data("run_001", "records")
        pool = ctx.get_data("run_001", "wave_pool")
        print(f"records: {len(records)} rows across "
              f"{len(set(records['channel'].tolist()))} channels; "
              f"pool: {pool.shape[0]} samples")

        df = ctx.get_data("run_001", "df")
        print(df.head())
        print(f"mean area {df['area'].mean():.1f} ADC·samples, "
              f"mean height {df['height'].mean():.1f} ADC")
        ctx.flush_saves()


if __name__ == "__main__":
    main()
