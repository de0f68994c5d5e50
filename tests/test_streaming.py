"""Streaming engine + sharded scan tests (reference analog:
tests/test_streaming_*.py, multidevice via the 8-device virtual CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveformanalysis_tpu.dtypes.chunk import Chunk
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.foundation.exceptions import ValidationError
from waveformanalysis_tpu.plugins.base import Option
from waveformanalysis_tpu.plugins.builtin.signal_peaks import SignalPeaksStreamPlugin
from waveformanalysis_tpu.plugins.builtin.filtering import FilteredWaveformsPlugin
from waveformanalysis_tpu.plugins.streaming import (
    StreamingConfig,
    StreamingContext,
    StreamingPlugin,
    data_to_chunks,
    get_streaming_context,
)
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms, make_tiny_context


def make_timed_records(times, dt=2, length=10):
    n = len(times)
    return Table({
        "time": np.asarray(times, dtype=np.int64),
        "dt": np.full(n, dt, np.int32),
        "length": np.full(n, length, np.int32),
        "channel": np.zeros(n, np.int16),
        "value": np.arange(n, dtype=np.float64),
    })


class TestDataToChunks:
    def test_chunking_by_count(self):
        tbl = make_timed_records(np.arange(10) * 1000)
        cfg = StreamingConfig(chunk_size=4)
        chunks = list(data_to_chunks(tbl, "r", "records", cfg))
        assert [len(c) for c in chunks] == [4, 4, 2]
        assert chunks[0].metadata["segment_id"] == 0
        # main windows tile the data
        assert chunks[0].metadata["main_end"] <= chunks[1].metadata["main_start"] + 1

    def test_break_segmentation(self):
        times = np.concatenate([np.arange(5) * 100,
                                20_000_000_000_000 + np.arange(5) * 100])
        tbl = make_timed_records(times)
        cfg = StreamingConfig(chunk_size=100, break_threshold_ps=1_000_000)
        chunks = list(data_to_chunks(tbl, "r", "records", cfg))
        assert len(chunks) == 2
        assert chunks[0].metadata["segment_id"] == 0
        assert chunks[1].metadata["segment_id"] == 1

    def test_halo_extension(self):
        tbl = make_timed_records(np.arange(10) * 1000)  # 1000 ps apart
        cfg = StreamingConfig(chunk_size=5, required_halo_left_ns=2.0,
                              required_halo_right_ns=2.0)  # 2000 ps halo
        chunks = list(data_to_chunks(tbl, "r", "records", cfg))
        assert len(chunks) == 2
        # second chunk pulls in ~2 halo rows from the left
        assert len(chunks[1]) > 5
        assert chunks[1].metadata["main_start"] == 5000

    def test_unsorted_input_sorted(self):
        tbl = make_timed_records([5000, 1000, 3000])
        chunks = list(data_to_chunks(tbl, "r", "x", StreamingConfig()))
        times = np.asarray(chunks[0].data["time"])
        assert list(times) == [1000, 3000, 5000]


class DoubleValuePlugin(StreamingPlugin):
    provides = "doubled_stream"
    depends_on = ["source_data"]
    version = "1.0"

    def compute_chunk(self, context, run_id, chunk):
        data = chunk.data
        return data.with_columns(value=np.asarray(data["value"]) * 2)


class StatefulCounter(StreamingPlugin):
    provides = "counted_stream"
    depends_on = ["source_data"]
    is_stateful = True
    resets = 0

    def reset_state(self):
        type(self).resets += 1

    def compute_chunk(self, context, run_id, chunk):
        return chunk.data


@pytest.fixture
def stream_ctx(tmp_path):
    ctx = make_tiny_context(tmp_path, st_waveforms=make_fake_st_waveforms(4, 32))
    tbl = make_timed_records(np.arange(20) * 1000)
    ctx.inject_data("test_run", "source_data", tbl)
    return ctx


class TestStreamingPlugin:
    def test_serial_stream(self, stream_ctx):
        stream_ctx.register(DoubleValuePlugin())
        stream_ctx.set_config({"doubled_stream": {"streaming_config": {"chunk_size": 6}}})
        out = list(stream_ctx.get_data("test_run", "doubled_stream"))
        assert len(out) == 4  # ceil(20/6)
        total = np.concatenate([np.asarray(c.data["value"]) for c in out])
        np.testing.assert_array_equal(total, np.arange(20) * 2)

    def test_parallel_stream_ordered(self, stream_ctx):
        stream_ctx.register(DoubleValuePlugin())
        stream_ctx.set_config({"doubled_stream": {"streaming_config": {
            "chunk_size": 3, "parallel": True, "max_workers": 4,
        }}})
        out = list(stream_ctx.get_data("test_run", "doubled_stream"))
        total = np.concatenate([np.asarray(c.data["value"]) for c in out])
        np.testing.assert_array_equal(total, np.arange(20) * 2)  # order kept

    def test_stateful_resets_on_segment_break(self, stream_ctx):
        StatefulCounter.resets = 0
        times = np.concatenate([np.arange(5) * 100,
                                90_000_000_000_000 + np.arange(5) * 100])
        stream_ctx.inject_data("test_run", "source_data", make_timed_records(times))
        stream_ctx.register(StatefulCounter())
        stream_ctx.set_config({"counted_stream": {"streaming_config": {
            "chunk_size": 3, "break_threshold_ps": 1_000_000,
        }}})
        list(stream_ctx.get_data("test_run", "counted_stream"))
        assert StatefulCounter.resets == 2  # one per segment

    def test_failing_chunk_fails_fast(self, stream_ctx):
        class Boom(StreamingPlugin):
            provides = "boom_stream"
            depends_on = ["source_data"]

            def compute_chunk(self, context, run_id, chunk):
                if np.asarray(chunk.data["time"]).min() > 5000:
                    raise RuntimeError("chunk exploded")
                return chunk.data

        stream_ctx.register(Boom())
        stream_ctx.set_config({"boom_stream": {"streaming_config": {
            "chunk_size": 3, "parallel": True, "max_workers": 2,
        }}})
        with pytest.raises(RuntimeError, match="chunk exploded"):
            list(stream_ctx.get_data("test_run", "boom_stream"))


class TestStreamingContext:
    def test_static_data_streams(self, stream_ctx):
        sc = get_streaming_context(stream_ctx)
        chunks = list(sc.get_stream("test_run", "source_data", chunk_size=7))
        assert len(chunks) == 3
        merged = sc.merge_stream(chunks)
        assert len(merged) == 20

    def test_time_range_clipping(self, stream_ctx):
        sc = get_streaming_context(stream_ctx)
        chunks = list(sc.get_stream("test_run", "source_data",
                                    time_range=(5000, 12_000), chunk_size=7))
        merged = sc.merge_stream(chunks)
        times = np.asarray(merged["time"])
        assert times.min() >= 5000 - 20  # intersect semantics keep overlaps
        assert times.max() < 12_000

    @pytest.mark.multidevice
    def test_merge_stream_device_backend(self, stream_ctx):
        from waveformanalysis_tpu.parallel.mesh import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        sc = get_streaming_context(stream_ctx)
        chunks = list(sc.get_stream("test_run", "source_data", chunk_size=7))
        host = sc.merge_stream(list(chunks), backend="host")
        chunks2 = list(sc.get_stream("test_run", "source_data", chunk_size=7))
        dev = sc.merge_stream(chunks2, backend="device", mesh=make_mesh(8))
        assert len(host) == len(dev)
        np.testing.assert_array_equal(
            np.asarray(host["time"]), np.asarray(dev["time"])
        )


class TestSignalPeaksStream:
    def test_stream_hits(self, tmp_path):
        st = make_fake_st_waveforms(n_events=40, wave_length=64,
                                    pulse_start=20, pulse_width=4,
                                    pulse_height=300)
        ctx = make_tiny_context(tmp_path, st_waveforms=st)
        ctx.register(SignalPeaksStreamPlugin())
        ctx.set_config({"signal_peaks_stream": {
            "height": 50.0, "prominence": 10.0, "width": 1,
            "streaming_config": {"chunk_size": 16},
        }})
        chunks = list(ctx.get_data("test_run", "signal_peaks_stream"))
        assert len(chunks) == 3
        n_hits = sum(len(c) for c in chunks)
        assert n_hits == 40  # one pulse per waveform
        # flat-channel contract: each chunk is a Table with channel
        for c in chunks:
            assert "channel" in c.data


@pytest.mark.multidevice
class TestShardedScan:
    def test_halo_exchange_and_psum(self):
        from waveformanalysis_tpu.parallel.mesh import make_mesh
        from waveformanalysis_tpu.parallel.scan import (
            make_sharded_pipeline,
            shard_table_arrays,
        )

        n_dev = min(8, jax.device_count())
        if n_dev < 2:
            pytest.skip("needs >= 2 devices")
        mesh = make_mesh(n_devices=n_dev)

        def kernel(x, left_halo=None, right_halo=None):
            # 3-point moving sum across shard boundaries
            ext = jnp.concatenate([left_halo, x, right_halo])
            smoothed = ext[:-2] + ext[1:-1] + ext[2:]
            return {"smoothed": smoothed, "total": jnp.sum(x)}

        n = n_dev * 4
        x = np.arange(n, dtype=np.float32)
        fn = make_sharded_pipeline(
            mesh, kernel, n_inputs=1,
            out_keys=("smoothed", "total"), stats_keys=("total",), halo=1,
        )
        (xs,) = shard_table_arrays(mesh, x)
        out = fn(xs)
        smoothed = np.asarray(out["smoothed"])
        # interior: x[i-1]+x[i]+x[i+1]; ends have zero halos
        expected = np.convolve(x, [1, 1, 1], mode="same")
        np.testing.assert_allclose(smoothed, expected)
        assert float(np.asarray(out["total"])) == x.sum()

    def test_padding_in_shard_table_arrays(self):
        from waveformanalysis_tpu.parallel.mesh import make_mesh
        from waveformanalysis_tpu.parallel.scan import shard_table_arrays

        n_dev = min(8, jax.device_count())
        if n_dev < 2:
            pytest.skip("needs >= 2 devices")
        mesh = make_mesh(n_devices=n_dev)
        (x,) = shard_table_arrays(mesh, np.ones(n_dev + 1))
        assert x.shape[0] == 2 * n_dev  # padded up


class WindowedSmoother(StreamingPlugin):
    """Time-windowed kernel: value averaged with rows within +-window_ns.

    Correct results at chunk edges REQUIRE halo rows — this is the plugin
    shape the halo machinery exists for.
    """

    provides = "smoothed_stream"
    depends_on = ["source_data"]
    version = "1.0"
    WINDOW_NS = 3  # +-3 ns around each row (times are ps)

    def compute_chunk(self, context, run_id, chunk):
        data = chunk.data
        t = np.asarray(data["time"], np.int64)
        v = np.asarray(data["value"], np.float64)
        win_ps = self.WINDOW_NS * 1000
        lo = np.searchsorted(t, t - win_ps, side="left")
        hi = np.searchsorted(t, t + win_ps, side="right")
        csum = np.concatenate([[0.0], np.cumsum(v)])
        out = (csum[hi] - csum[lo]) / (hi - lo)
        return data.with_columns(value=out)


class TestChunkInvariance:
    """Streamed-with-halo output must equal the unchunked computation for
    EVERY chunk size — the core streaming invariant."""

    @pytest.mark.parametrize("chunk_size", [3, 5, 7, 20, 50])
    def test_windowed_kernel_chunk_invariant(self, tmp_path, chunk_size):
        ctx = make_tiny_context(tmp_path,
                               st_waveforms=make_fake_st_waveforms(4, 32))
        rng = np.random.default_rng(chunk_size)
        # irregular spacing so windows span chunk boundaries unpredictably
        times = np.cumsum(rng.integers(500, 4000, 40)).astype(np.int64)
        tbl = make_timed_records(times)
        ctx.inject_data("test_run", "source_data", tbl)
        ctx.register(WindowedSmoother())
        ctx.set_config({"smoothed_stream": {"streaming_config": {
            "chunk_size": chunk_size,
            "required_halo_ns": WindowedSmoother.WINDOW_NS,
        }}})

        chunks = list(ctx.get_data("test_run", "smoothed_stream"))
        streamed = np.concatenate(
            [np.asarray(c.data["value"]) for c in chunks])
        streamed_t = np.concatenate(
            [np.asarray(c.data["time"]) for c in chunks])

        # unchunked ground truth
        whole = WindowedSmoother().compute_chunk(
            None, "test_run",
            type("C", (), {"data": tbl})(),
        )
        np.testing.assert_array_equal(streamed_t, times)
        np.testing.assert_allclose(streamed, np.asarray(whole["value"]),
                                   err_msg=f"chunk_size={chunk_size}")


@pytest.mark.multidevice
class TestDeviceChunkExecutor:
    """streaming_config executor_type="device": chunks become mesh shards,
    each group of n_shards chunks dispatches as ONE shard_map program
    (plugins/streaming.py _compute_device). Chunk windows / halo / breaks /
    clipping are the host engine's, so streams must match chunk-for-chunk."""

    def _ctx(self, tmp_path, sub, streaming_config, mesh=None):
        st = make_fake_st_waveforms(n_events=100, wave_length=64,
                                    pulse_start=20, pulse_width=4,
                                    pulse_height=300)
        ctx = make_tiny_context(tmp_path / sub, st_waveforms=st)
        ctx.register(SignalPeaksStreamPlugin())
        ctx.set_config({"signal_peaks_stream": {
            "height": 50.0, "prominence": 10.0, "width": 1,
            "streaming_config": streaming_config,
        }})
        if mesh is not None:
            ctx.attach_mesh(mesh)
        return ctx

    def test_device_stream_matches_host_chunks(self, tmp_path):
        import jax

        from waveformanalysis_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(8)
        # 100 events / chunk 16 -> 7 chunks: exercises a full 8-shard-padded
        # group boundary (one group, one partially-empty shard)
        host = self._ctx(tmp_path, "h", {"chunk_size": 16})
        dev = self._ctx(tmp_path, "d",
                        {"chunk_size": 16, "executor_type": "device"},
                        mesh=mesh)
        host_chunks = list(host.get_data("test_run", "signal_peaks_stream"))
        dev_chunks = list(dev.get_data("test_run", "signal_peaks_stream"))
        assert len(host_chunks) == len(dev_chunks) == 7
        for hc, dc in zip(host_chunks, dev_chunks):
            assert (hc.start, hc.end) == (dc.start, dc.end)
            assert hc.metadata["segment_id"] == dc.metadata["segment_id"]
            for field in hc.data.field_names:
                np.testing.assert_array_equal(
                    np.asarray(hc.data[field]), np.asarray(dc.data[field]),
                    err_msg=field,
                )

    def test_device_stream_multi_group(self, tmp_path):
        """More chunks than shards: groups dispatch in order."""
        import jax

        from waveformanalysis_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = make_mesh(4)
        host = self._ctx(tmp_path, "h2", {"chunk_size": 8})
        dev = self._ctx(tmp_path, "d2",
                        {"chunk_size": 8, "executor_type": "device"},
                        mesh=mesh)
        host_chunks = list(host.get_data("test_run", "signal_peaks_stream"))
        dev_chunks = list(dev.get_data("test_run", "signal_peaks_stream"))
        assert len(host_chunks) == len(dev_chunks) == 13
        for hc, dc in zip(host_chunks, dev_chunks):
            np.testing.assert_array_equal(
                np.asarray(hc.data["position"]), np.asarray(dc.data["position"])
            )
            np.testing.assert_array_equal(
                np.asarray(hc.data["timestamp"]), np.asarray(dc.data["timestamp"])
            )

    def test_device_fallback_without_hooks(self, tmp_path, caplog):
        """A stream plugin without device hooks falls back to host execution
        instead of failing."""
        import logging

        from waveformanalysis_tpu.plugins.streaming import (
            StreamingConfig,
            StreamingPlugin,
        )
        from waveformanalysis_tpu.dtypes.table import Table

        class Doubler(StreamingPlugin):
            provides = "doubled_stream"
            depends_on = ["st_waveforms"]
            save_when = "never"

            def compute_chunk(self, context, run_id, chunk):
                data = chunk.data
                if not isinstance(data, Table):
                    data = Table.from_numpy(data)
                return data

        st = make_fake_st_waveforms(n_events=20, wave_length=32)
        ctx = make_tiny_context(tmp_path, st_waveforms=st)
        ctx.register(Doubler())
        ctx.set_config({"doubled_stream": {
            "streaming_config": {"chunk_size": 8, "executor_type": "device"},
        }})
        with caplog.at_level(logging.WARNING):
            chunks = list(ctx.get_data("test_run", "doubled_stream"))
        assert sum(len(c) for c in chunks) == 20
        assert any("device-parallel" in r.message for r in caplog.records)


@pytest.mark.multidevice
class TestDeviceChunkExecutorEdges:
    def test_large_chunks_grow_bucket(self, tmp_path):
        """Chunk rows above the 512 floor bucket to the next power of two
        and still match the host stream."""
        import jax

        from waveformanalysis_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        st = make_fake_st_waveforms(n_events=1400, wave_length=32,
                                    pulse_start=10, pulse_width=3,
                                    pulse_height=300)
        def run(sub, cfg, mesh=None):
            ctx = make_tiny_context(tmp_path / sub, st_waveforms=st)
            ctx.register(SignalPeaksStreamPlugin())
            ctx.set_config({"signal_peaks_stream": {
                "height": 50.0, "prominence": 10.0, "width": 1,
                "streaming_config": cfg,
            }})
            if mesh is not None:
                ctx.attach_mesh(mesh)
            return list(ctx.get_data("test_run", "signal_peaks_stream"))

        host = run("h", {"chunk_size": 700})
        dev = run("d", {"chunk_size": 700, "executor_type": "device"},
                  mesh=make_mesh(2))
        assert len(host) == len(dev) == 2
        for hc, dc in zip(host, dev):
            np.testing.assert_array_equal(
                np.asarray(hc.data["position"]),
                np.asarray(dc.data["position"]),
            )

    def test_program_cache_reused_across_groups(self, tmp_path):
        """Same (cfg, shapes, mesh) -> one compiled program for all groups."""
        import jax

        from waveformanalysis_tpu.parallel.mesh import make_mesh
        from waveformanalysis_tpu.plugins.streaming import StreamingPlugin

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        st = make_fake_st_waveforms(n_events=64, wave_length=32,
                                    pulse_start=10, pulse_width=3,
                                    pulse_height=300)
        ctx = make_tiny_context(tmp_path, st_waveforms=st)
        ctx.register(SignalPeaksStreamPlugin())
        ctx.set_config({"signal_peaks_stream": {
            "height": 50.0, "prominence": 10.0, "width": 1,
            "streaming_config": {"chunk_size": 8, "executor_type": "device"},
        }})
        ctx.attach_mesh(make_mesh(2))
        saved = dict(StreamingPlugin._device_programs)
        StreamingPlugin._device_programs.clear()
        try:
            chunks = list(ctx.get_data("test_run", "signal_peaks_stream"))
            assert len(chunks) == 8  # 4 groups of 2 shards
            # one program served every group (keys exclude leading row
            # counts — jit retraces per shape, the cache entry is shared)
            assert len(StreamingPlugin._device_programs) == 1
        finally:
            StreamingPlugin._device_programs.update(saved)
