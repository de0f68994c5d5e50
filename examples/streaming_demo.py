"""Chunked streaming execution: halos, break segmentation, clipping.

Runs the signal_peaks_stream plugin over a synthetic run through the
StreamingContext, showing chunk iteration with time-window clipping, then
demonstrates the core invariant directly: a windowed kernel streamed with
halo extensions produces exactly the unchunked result.

Run: JAX_PLATFORMS=cpu python examples/streaming_demo.py
"""

import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("MPLBACKEND", "Agg")
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.streaming import (
    StreamingPlugin,
    get_streaming_context,
)
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms


class MovingAverage(StreamingPlugin):
    """Average `value` over rows within +-window_ns — needs halo rows to be
    correct at chunk boundaries."""

    provides = "smoothed"
    depends_on = ["readings"]
    version = "1.0"
    WINDOW_NS = 5

    def compute_chunk(self, context, run_id, chunk):
        t = np.asarray(chunk.data["time"], np.int64)
        v = np.asarray(chunk.data["value"], np.float64)
        win = self.WINDOW_NS * 1000  # ps
        lo = np.searchsorted(t, t - win, "left")
        hi = np.searchsorted(t, t + win, "right")
        csum = np.concatenate([[0.0], np.cumsum(v)])
        return chunk.data.with_columns(value=(csum[hi] - csum[lo]) / (hi - lo))


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        ctx = Context(storage_dir=tmp, config={"show_progress": False})
        rng = np.random.default_rng(0)
        times = np.cumsum(rng.integers(1000, 5000, 200)).astype(np.int64)
        readings = Table({
            "time": times,
            "dt": np.full(200, 2, np.int32),
            "channel": np.zeros(200, np.int16),
            "value": rng.normal(100, 15, 200),
        })
        ctx.inject_data("demo", "readings", readings)
        ctx.register(MovingAverage())
        ctx.set_config({"smoothed": {"streaming_config": {
            "chunk_size": 32,
            "required_halo_ns": MovingAverage.WINDOW_NS,
        }}})

        sctx = get_streaming_context(ctx)
        chunks = list(sctx.get_stream("demo", "smoothed"))
        print(f"streamed {len(chunks)} chunks:")
        for c in chunks[:4]:
            print(f"  [{c.start:>9} .. {c.end:>9}) ps  {len(c.data)} rows")
        streamed = np.concatenate([np.asarray(c.data["value"]) for c in chunks])

        whole = MovingAverage().compute_chunk(
            None, "demo", type("C", (), {"data": readings})())
        assert np.allclose(streamed, np.asarray(whole["value"]))
        print("chunk-invariance verified: streamed == unchunked "
              f"({len(streamed)} rows)")

        # ctx.get_data on a stream plugin persists chunks incrementally and
        # re-reads come from the cache
        out = list(ctx.get_data("demo", "smoothed"))
        print(f"via Context: {len(out)} chunks (persisted incrementally)")


if __name__ == "__main__":
    main()
