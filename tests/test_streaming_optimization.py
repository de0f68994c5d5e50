"""Streaming optimization/boundary behaviors (reference analog:
tests/test_streaming_optimization.py): halo clipping exactness, break
segmentation thresholds, worker-bucket quantization, chunk-size resolution
precedence, and stream save-through incremental persistence.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.dtypes import chunk as C
from waveformanalysis_tpu.dtypes.chunk import Chunk
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.streaming import (
    StreamingConfig,
    StreamingPlugin,
    data_to_chunks,
)
from waveformanalysis_tpu.testing.fixtures import make_tiny_context


def _timed(times, **extra):
    times = np.asarray(times, dtype=np.int64)
    cols = {"time": times, "value": times.astype(np.float64)}
    cols.update(extra)
    return Table(cols)


class EchoStream(StreamingPlugin):
    provides = "echo_stream"
    depends_on = ["source_data"]
    save_when = "never"

    def compute_chunk(self, context, run_id, chunk):
        return chunk.data


class SavingStream(StreamingPlugin):
    provides = "saving_stream"
    depends_on = ["source_data"]
    save_when = "always"

    def compute_chunk(self, context, run_id, chunk):
        return chunk.data


class TestChunking:
    def test_chunk_sizes_and_coverage(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        times = (np.arange(101, dtype=np.int64) + 1) * 1000
        ctx.inject_data("test_run", "source_data", _timed(times))
        ctx.register(EchoStream())
        ctx.set_config({"echo_stream": {"streaming_config": {"chunk_size": 25}}})
        chunks = list(ctx.get_data("test_run", "echo_stream"))
        sizes = [len(c) for c in chunks]
        assert sum(sizes) == 101
        assert max(sizes) <= 25
        # chunks tile the time axis without overlap of MAIN windows
        for a, b in zip(chunks[:-1], chunks[1:]):
            assert a.end <= b.start

    def test_break_segmentation(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        t1 = (np.arange(10, dtype=np.int64) + 1) * 1000
        t2 = t1 + 10**13 + 10**9  # beyond default break threshold
        ctx.inject_data("test_run", "source_data",
                        _timed(np.concatenate([t1, t2])))
        ctx.register(EchoStream())
        ctx.set_config({"echo_stream": {"streaming_config": {
            "chunk_size": 100,
        }}})
        chunks = list(ctx.get_data("test_run", "echo_stream"))
        segs = {c.metadata.get("segment_id") for c in chunks}
        assert len(segs) == 2  # gap opened a new segment

    def test_break_threshold_configurable(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        t1 = (np.arange(10, dtype=np.int64) + 1) * 1000
        t2 = t1 + 10**7  # small gap
        ctx.inject_data("test_run", "source_data",
                        _timed(np.concatenate([t1, t2])))
        ctx.register(EchoStream())
        ctx.set_config({"echo_stream": {"streaming_config": {
            "chunk_size": 100, "break_threshold_ps": 1e6,
        }}})
        chunks = list(ctx.get_data("test_run", "echo_stream"))
        segs = {c.metadata.get("segment_id") for c in chunks}
        assert len(segs) == 2

    def test_halo_attached_and_clipped(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        times = (np.arange(30, dtype=np.int64) + 1) * 1000
        ctx.inject_data("test_run", "source_data", _timed(times))
        ctx.register(EchoStream())
        ctx.set_config({"echo_stream": {"streaming_config": {
            "chunk_size": 10, "required_halo_ns": 3,  # 3 ns = 3000 ps
        }}})
        chunks = list(ctx.get_data("test_run", "echo_stream"))
        # output chunks are clipped back to main windows: total row count
        # equals the input exactly (no halo duplication leaks through)
        assert sum(len(c) for c in chunks) == 30
        all_times = np.concatenate([np.asarray(c.data["time"]) for c in chunks])
        np.testing.assert_array_equal(np.sort(all_times), times)


class TestStreamSaveThrough:
    def test_incremental_persistence(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        times = (np.arange(40, dtype=np.int64) + 1) * 1000
        ctx.inject_data("test_run", "source_data", _timed(times))
        ctx.register(SavingStream())
        ctx.set_config({"saving_stream": {"streaming_config": {"chunk_size": 8}}})
        chunks = list(ctx.get_data("test_run", "saving_stream"))
        assert len(chunks) == 5
        # finalize happened: a fresh context loads the merged stream
        clone = ctx.clone()
        clone.inject_data("test_run", "source_data", _timed(times))
        loaded = clone.get_data("test_run", "saving_stream")
        # stream outputs reload as static merged data from cache
        if hasattr(loaded, "__next__"):
            loaded = C._concat([c.data for c in loaded])
        assert len(loaded) == 40

    def test_abort_on_failure_leaves_no_partial_cache(self, tmp_path):
        class Boom(SavingStream):
            provides = "boom_save_stream"

            def compute_chunk(self, context, run_id, chunk):
                if np.asarray(chunk.data["time"])[0] > 20_000:
                    raise RuntimeError("mid-stream failure")
                return chunk.data

        ctx = make_tiny_context(tmp_path)
        times = (np.arange(40, dtype=np.int64) + 1) * 1000
        ctx.inject_data("test_run", "source_data", _timed(times))
        ctx.register(Boom())
        ctx.set_config({"boom_save_stream": {"streaming_config": {"chunk_size": 8}}})
        with pytest.raises(RuntimeError, match="mid-stream"):
            list(ctx.get_data("test_run", "boom_save_stream"))
        key = ctx.key_for("test_run", "boom_save_stream")
        assert not ctx.storage.exists(key, run_id="test_run")


class TestStreamingConfigResolution:
    def test_defaults_and_overrides(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(EchoStream())
        cfg = StreamingConfig.resolve(ctx, ctx.get_plugin("echo_stream"))
        assert cfg.chunk_size > 0
        ctx.set_config({"echo_stream": {"streaming_config": {
            "chunk_size": 123, "parallel": True, "max_workers": 3,
        }}})
        cfg2 = StreamingConfig.resolve(ctx, ctx.get_plugin("echo_stream"))
        assert cfg2.chunk_size == 123
        assert cfg2.parallel and cfg2.max_workers == 3

    def test_streaming_config_untracked(self, tmp_path):
        ctx = make_tiny_context(tmp_path)
        ctx.register(EchoStream())
        k1 = ctx.key_for("test_run", "echo_stream")
        ctx.set_config({"echo_stream": {"streaming_config": {"chunk_size": 7}}})
        assert ctx.key_for("test_run", "echo_stream") == k1


class TestDataToChunks:
    def test_respects_sorted_input(self):
        times = np.array([5000, 1000, 3000], dtype=np.int64)
        tbl = _timed(times)
        cfg = StreamingConfig(chunk_size=10)
        chunks = list(data_to_chunks(tbl, run_id="r", data_type="x", cfg=cfg))
        merged = np.concatenate([np.asarray(c.data["time"]) for c in chunks])
        assert C.check_monotonic(
            Table({"time": merged}), field="time", strict=False
        ).is_valid

    def test_empty_input(self):
        cfg = StreamingConfig(chunk_size=10)
        chunks = list(data_to_chunks(
            _timed(np.array([], dtype=np.int64)), run_id="r",
            data_type="x", cfg=cfg,
        ))
        assert chunks == []
