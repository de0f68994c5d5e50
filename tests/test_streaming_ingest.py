"""Memory-bounded streaming ingest: bit-parity + bounded-residency tests.

Covers VERDICT r4 Missing #2 / next-step #3: `st_waveforms.streaming_mode`
(reference cpu/waveforms.py:1457 `_compute_streaming`) and the real
incremental records builder (reference core/processing/records_builder.py:524)
— both must produce BIT-IDENTICAL outputs to the materialized paths while
keeping peak resident memory ~one part instead of the whole run.
"""

from __future__ import annotations

import tracemalloc

import numpy as np
import pytest

from waveformanalysis_tpu.testing.fixtures import make_synthetic_vx2730_run


def _make_run(tmp_path, n_channels=2, n_files=3, n_rows=40, n_samples=48):
    make_synthetic_vx2730_run(
        str(tmp_path), run_name="run_001", n_channels=n_channels,
        n_files_per_channel=n_files, n_rows=n_rows, n_samples=n_samples,
        seed=7,
    )
    return "run_001"


def _ctx(tmp_path, store_name, extra_config=None):
    from waveformanalysis_tpu.context.context import Context
    from waveformanalysis_tpu.plugins import plugin_sets

    cfg = {"data_root": str(tmp_path), "daq_adapter": "vx2730",
           "n_channels": 2, "show_progress": False}
    cfg.update(extra_config or {})
    ctx = Context(storage_dir=str(tmp_path / store_name), config=cfg)
    ctx.register(*plugin_sets.cpu_default())
    return ctx


def _assert_tables_identical(a, b):
    cols_a = a.to_host().columns if hasattr(a, "to_host") else a
    cols_b = b.to_host().columns if hasattr(b, "to_host") else b
    assert set(cols_a) == set(cols_b)
    for k in cols_a:
        va, vb = np.asarray(cols_a[k]), np.asarray(cols_b[k])
        assert va.dtype == vb.dtype, f"{k}: {va.dtype} vs {vb.dtype}"
        if va.dtype.kind == "f":
            assert np.array_equal(va, vb, equal_nan=True), k
        else:
            assert np.array_equal(va, vb), k


class TestStreamingStWaveforms:
    def test_bit_identical_to_materialized(self, tmp_path):
        run = _make_run(tmp_path)
        base = _ctx(tmp_path, "store_base").get_data(run, "st_waveforms")
        stream = _ctx(
            tmp_path, "store_stream",
            {"st_waveforms": {"streaming_mode": True}},
        ).get_data(run, "st_waveforms")
        _assert_tables_identical(base, stream)

    def test_chunksize_slicing_is_invisible(self, tmp_path):
        run = _make_run(tmp_path, n_rows=37)
        base = _ctx(tmp_path, "store_base").get_data(run, "st_waveforms")
        # chunksize that doesn't divide the file row count exercises the
        # ragged final slice
        stream = _ctx(
            tmp_path, "store_stream",
            {"st_waveforms": {"streaming_mode": True, "chunksize": 11}},
        ).get_data(run, "st_waveforms")
        _assert_tables_identical(base, stream)

    def test_downstream_pipeline_identical(self, tmp_path):
        run = _make_run(tmp_path)
        base_ctx = _ctx(tmp_path, "store_base")
        stream_ctx = _ctx(
            tmp_path, "store_stream",
            {"st_waveforms": {"streaming_mode": True}},
        )
        for name in ("basic_features", "hit", "s1_s2"):
            _assert_tables_identical(
                base_ctx.get_data(run, name), stream_ctx.get_data(run, name)
            )

    def test_cache_roundtrip(self, tmp_path):
        # the memmap-backed wave column must survive the save/load path
        run = _make_run(tmp_path)
        ctx = _ctx(
            tmp_path, "store_stream",
            {"st_waveforms": {"streaming_mode": True}},
        )
        first = ctx.get_data(run, "st_waveforms")
        ctx.flush_saves()
        ctx2 = _ctx(
            tmp_path, "store_stream",
            {"st_waveforms": {"streaming_mode": True}},
        )
        second = ctx2.get_data(run, "st_waveforms")
        _assert_tables_identical(first, second)

    @pytest.mark.slow
    def test_peak_memory_is_bounded(self, tmp_path):
        # 8 files x 1200 rows x 96 samples per channel: the materialized
        # path stacks each channel (~2 x 9.6k x 103 x f8 ~ 16 MB resident)
        # while streaming holds ~one file (~1 MB) plus scalar columns.
        run = _make_run(tmp_path, n_files=8, n_rows=1200, n_samples=96)

        def peak_of(extra):
            import gc

            gc.collect()
            ctx = _ctx(tmp_path, f"store_{len(extra)}", extra)
            tracemalloc.start()
            ctx.get_data(run, "st_waveforms")
            _, peak = tracemalloc.get_traced_memory()
            tracemalloc.stop()
            return peak

        peak_mat = peak_of({})
        peak_stream = peak_of({"st_waveforms": {"streaming_mode": True}})
        # the bound: streaming must hold well under half the materialized
        # residency on a run whose decode dwarfs per-call overheads
        assert peak_stream < 0.55 * peak_mat, (
            f"streaming peak {peak_stream/1e6:.1f} MB not bounded vs "
            f"materialized {peak_mat/1e6:.1f} MB"
        )


class TestStreamingRecordsBuilder:
    def _raw_files(self, tmp_path, **kw):
        run = _make_run(tmp_path, **kw)
        from waveformanalysis_tpu.processing.loader import get_raw_files

        return run, get_raw_files(
            run_name=run, data_root=str(tmp_path), daq_adapter="vx2730",
            n_channels=2,
        )

    def test_bit_identical_bundle(self, tmp_path):
        from waveformanalysis_tpu.processing.records_builder import (
            build_records_from_raw_files,
            build_records_from_raw_files_streaming,
        )

        _, raw_files = self._raw_files(tmp_path, n_files=3, n_rows=40)
        mat = build_records_from_raw_files(
            raw_files, "vx2730", default_dt_ns=2, epoch_ns=12345,
        )
        stream = build_records_from_raw_files_streaming(
            raw_files, "vx2730", default_dt_ns=2, epoch_ns=12345,
        )
        _assert_tables_identical(mat.records, stream.records)
        assert np.array_equal(np.asarray(mat.wave_pool),
                              np.asarray(stream.wave_pool))

    def test_multi_part_boundaries(self, tmp_path):
        from waveformanalysis_tpu.processing.records_builder import (
            build_records_from_raw_files,
            build_records_from_raw_files_streaming,
        )

        _, raw_files = self._raw_files(tmp_path, n_files=4, n_rows=25)
        # part_size smaller than a channel's total rows forces several
        # spilled parts per channel
        mat = build_records_from_raw_files(
            raw_files, "vx2730", default_dt_ns=2, part_size=30,
        )
        stream = build_records_from_raw_files_streaming(
            raw_files, "vx2730", default_dt_ns=2, part_size=30,
        )
        _assert_tables_identical(mat.records, stream.records)
        assert np.array_equal(np.asarray(mat.wave_pool),
                              np.asarray(stream.wave_pool))

    def test_empty_run(self, tmp_path):
        from waveformanalysis_tpu.processing.records_builder import (
            build_records_from_raw_files_streaming,
        )

        bundle = build_records_from_raw_files_streaming([[], []], "vx2730")
        assert len(bundle.records) == 0
        assert bundle.wave_pool.size == 0

    @pytest.mark.slow
    def test_peak_memory_is_bounded(self, tmp_path):
        import gc

        from waveformanalysis_tpu.processing.records_builder import (
            build_records_from_raw_files,
            build_records_from_raw_files_streaming,
        )

        _, raw_files = self._raw_files(
            tmp_path, n_files=8, n_rows=1200, n_samples=96
        )

        def peak_of(fn):
            gc.collect()
            tracemalloc.start()
            fn(raw_files, "vx2730", default_dt_ns=2, part_size=2000)
            _, peak = tracemalloc.get_traced_memory()
            tracemalloc.stop()
            return peak

        peak_mat = peak_of(build_records_from_raw_files)
        peak_stream = peak_of(build_records_from_raw_files_streaming)
        assert peak_stream < 0.7 * peak_mat, (
            f"streaming peak {peak_stream/1e6:.1f} MB not bounded vs "
            f"materialized {peak_mat/1e6:.1f} MB"
        )
