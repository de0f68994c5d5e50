#!/usr/bin/env python
"""Preview a few raw events without running the pipeline.

WaveformPreviewer reads only as many files as needed, structures minimally,
and gives quick feature estimates — the "look before you process" tool
(reference analog: examples/preview_quickstart.md, utils/preview.py).
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from waveformanalysis_tpu.testing.fixtures import make_synthetic_vx2730_run
from waveformanalysis_tpu.utils.preview import WaveformPreviewer


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_vx2730_run(tmp, run_name="run_001", n_channels=2,
                                  n_files_per_channel=3, n_rows=50)

        pv = WaveformPreviewer(tmp, "run_001", daq_adapter="vx2730")

        events = pv.load_events(channel=0, start=0, n_events=8)
        print(f"loaded {len(events)} events, wave length "
              f"{events['wave'].shape[1]}")

        feats = pv.preview_features(events)
        for i in range(len(events)):
            print(f"  event {i}: height {feats['height'][i]:.0f} ADC, "
                  f"area {feats['area'][i]:.0f}")

        # time-windowed load: events in the first 200 us (ps units)
        windowed = pv.load_by_timestamp(channel=1, start_ps=0,
                                        end_ps=200_000_000)
        print(f"channel 1 events in the first 200 us: {len(windowed)}")


if __name__ == "__main__":
    main()
