"""signal_peaks_stream plugin: chunked streaming peak detection.

Behavioral analog of the reference streaming peak finder
(reference: waveform_analysis/core/plugins/builtin/streaming/cpu/
signal_peaks.py:36): streams filtered (or raw) waveforms in chunks and emits
HIT-shaped chunks; never persisted (save_when=never). Each chunk runs the
batched find_peaks device kernel instead of a per-waveform scipy loop.
"""

from __future__ import annotations

import logging
from typing import Any, List, Optional

import numpy as np

import jax.numpy as jnp

from waveformanalysis_tpu.dtypes.chunk import Chunk
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.ops import peaks as PK
from waveformanalysis_tpu.plugins.base import Option
from waveformanalysis_tpu.plugins.builtin.peak_finding import HIT_SCHEMA
from waveformanalysis_tpu.plugins.streaming import StreamingConfig, StreamingPlugin

logger = logging.getLogger(__name__)


class SignalPeaksStreamPlugin(StreamingPlugin):
    """Streamed peak detection over waveform chunks."""

    provides = "signal_peaks_stream"
    depends_on: List[str] = []
    description = "Streaming peak detection over filtered waveforms."
    version = "1.0.0"
    kernel_version = PK.KERNEL_VERSION
    save_when = "never"
    output_dtype = HIT_SCHEMA
    options = {
        "use_filtered": Option(default=True, type=bool,
                               help="Prefer filtered_waveforms when registered"),
        "height": Option(default=30.0, type=float, help="Minimum peak height"),
        "distance": Option(default=2, type=int, help="Minimum peak separation"),
        "prominence": Option(default=0.7, type=float, help="Minimum prominence"),
        "width": Option(default=4, type=int, help="Minimum peak width"),
        "dt": Option(default=None, type=int, help="Sample interval fallback (ns)"),
        "streaming_config": Option(
            default=None, type=dict, track=False,
            help="Streaming knobs; default chunk_size 4096",
        ),
    }

    def resolve_depends_on(self, context: Any, run_id: Optional[str] = None):
        use_filtered = context.get_config(self, "use_filtered")
        if use_filtered and "filtered_waveforms" in context.plugins:
            return ["filtered_waveforms", "st_waveforms"]
        return ["st_waveforms"]

    def input_stream(self, context: Any, run_id: str, cfg: StreamingConfig):
        if cfg.chunk_size == StreamingConfig().chunk_size:
            cfg.chunk_size = 4096  # reference default for this plugin
        deps = self.resolve_depends_on(context, run_id)
        from waveformanalysis_tpu.plugins.streaming import data_to_chunks

        data = context.get_data(run_id, deps[0])
        yield from data_to_chunks(data, run_id=run_id, data_type=deps[0], cfg=cfg)

    def compute_chunk(self, context: Any, run_id: str, chunk: Chunk) -> Table:
        data = chunk.data
        n = len(data)
        if n == 0:
            return Table.zeros(0, HIT_SCHEMA)
        if not isinstance(data, Table):
            data = Table.from_numpy(data)

        height = float(context.get_config(self, "height"))
        distance = int(context.get_config(self, "distance"))
        prominence = float(context.get_config(self, "prominence"))
        width = float(context.get_config(self, "width"))
        dt_cfg = context.get_config(self, "dt")

        waves = np.asarray(data["wave"]).astype(np.float32)
        baselines = np.asarray(data["baseline"], dtype=np.float64) \
            if "baseline" in data else np.zeros(n)
        pol = np.asarray(data["polarity"], dtype=np.int8) \
            if "polarity" in data else np.full(n, -1, np.int8)
        sign = np.where(pol > 0, 1.0, -1.0).astype(np.float32)
        lengths = np.asarray(data["event_length"], dtype=np.int64) \
            if "event_length" in data else np.full(n, waves.shape[1], np.int64)

        det = sign[:, None] * np.diff(waves, axis=1)
        results = PK.find_peaks_batch(
            jnp.asarray(det), height=height, prominence=prominence,
            width=width, distance=distance,
            valid_length=jnp.asarray((lengths - 1).astype(np.int32)),
        )
        heights = PK.peak_heights_batch(
            jnp.asarray(waves), results["left_ips"], results["right_ips"],
            results["valid"],
        )
        results = {k: np.asarray(v) for k, v in results.items()}

        dt = np.asarray(data["dt"], dtype=np.int64) if "dt" in data else None
        if dt is None:
            dt = np.full(n, int(dt_cfg or 2), dtype=np.int64)
        cols = PK.compact_hits(
            results, np.asarray(heights),
            timestamps=np.asarray(data["timestamp"], np.int64)
            if "timestamp" in data else np.zeros(n, np.int64),
            boards=np.asarray(data["board"], np.int16)
            if "board" in data else np.zeros(n, np.int16),
            channels=np.asarray(data["channel"], np.int16)
            if "channel" in data else np.zeros(n, np.int16),
            record_ids=np.asarray(data["record_id"], np.int64)
            if "record_id" in data else np.arange(n, dtype=np.int64),
            dt_ns=dt,
        )
        return Table(cols, schema=HIT_SCHEMA)
