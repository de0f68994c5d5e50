"""Multi-run batched fused dispatch: get_data_batched.

Runs concatenate on the event axis into ONE device program per matching
device configuration (context/fusion.py compute_many); outputs must be
bit-identical to per-run get_data, flow through the same save/lineage
machinery, and mix transparently with cached runs.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.dataframe import DataFramePlugin
from waveformanalysis_tpu.plugins.builtin.event_analysis import GroupedEventsPlugin
from waveformanalysis_tpu.plugins.builtin.hit_finder import ThresholdHitPlugin
from waveformanalysis_tpu.plugins.builtin.peak_finding import HitFinderPlugin
from waveformanalysis_tpu.plugins.builtin.waveform_width_integral import (
    WaveformWidthIntegralPlugin,
)
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms

MEMBERS = ["basic_features", "hit", "hit_threshold", "waveform_width_integral"]


def _st(n, L=128, seed=0, pulse_height=300):
    st = make_fake_st_waveforms(
        n_events=n, wave_length=L, pulse_height=pulse_height,
        polarity="positive", noise_rms=3.0, seed=seed,
    )
    st["channel"] = (np.arange(n) % 2).astype(np.int16)
    return st


def _make_ctx(tmp_path, sub, runs, bucket=256):
    ctx = Context(
        storage_dir=str(tmp_path / sub),
        config={"show_progress": False, "fused_batch_bucket": bucket},
    )
    ctx.register(BasicFeaturesPlugin(), HitFinderPlugin(), ThresholdHitPlugin(),
                 WaveformWidthIntegralPlugin(), DataFramePlugin(),
                 GroupedEventsPlugin())
    ctx.set_config({"hit": {"use_filtered": False, "use_derivative": False,
                            "height": 100.0, "prominence": 50.0, "width": 2}})
    for rid, st in runs.items():
        ctx.inject_data(rid, "st_waveforms", st)
    return ctx


def _assert_tables_equal(a, b, label=""):
    assert isinstance(a, Table) and isinstance(b, Table), label
    assert len(a) == len(b), f"{label}: {len(a)} vs {len(b)}"
    assert set(a.columns) == set(b.columns), label
    for col in a.columns:
        np.testing.assert_array_equal(
            np.asarray(a[col]), np.asarray(b[col]), err_msg=f"{label}.{col}"
        )


@pytest.fixture()
def runs():
    # deliberately different sizes so run boundaries are non-trivial and the
    # bucket padding path (pad to multiple of 256) is exercised
    return {
        "run_a": _st(180, seed=1),
        "run_b": _st(300, seed=2),
        "run_c": _st(77, seed=3),
    }


def test_batched_matches_per_run(tmp_path, runs):
    ctx_ref = _make_ctx(tmp_path, "ref", runs)
    ref = {
        rid: ctx_ref.get_data(rid, MEMBERS) for rid in runs
    }

    ctx_b = _make_ctx(tmp_path, "batched", runs)
    got = ctx_b.get_data_batched(list(runs), MEMBERS)

    for rid in runs:
        for m in MEMBERS:
            _assert_tables_equal(ref[rid][m], got[rid][m], f"{rid}.{m}")
    ctx_ref.flush_saves()
    ctx_b.flush_saves()


def test_batched_downstream_host_plugins(tmp_path, runs):
    """df_events (host grouping downstream of the bundle) matches per-run."""
    ctx_ref = _make_ctx(tmp_path, "ref", runs)
    ref = {rid: ctx_ref.get_data(rid, "df_events") for rid in runs}

    ctx_b = _make_ctx(tmp_path, "batched", runs)
    got = ctx_b.get_data_batched(list(runs), "df_events")
    for rid in runs:
        assert len(got[rid]) == len(ref[rid]), rid
        for col in ref[rid].columns:
            np.testing.assert_array_equal(
                np.asarray(ref[rid][col]), np.asarray(got[rid][col]),
                err_msg=f"{rid}.df_events.{col}",
            )
    ctx_ref.flush_saves()
    ctx_b.flush_saves()


def test_batched_saves_and_caches(tmp_path, runs):
    ctx = _make_ctx(tmp_path, "c", runs)
    got = ctx.get_data_batched(list(runs), MEMBERS)
    ctx.flush_saves()

    # a fresh context over the same storage must read every run from disk
    ctx2 = _make_ctx(tmp_path, "c", runs)
    for rid in runs:
        for m in MEMBERS:
            assert ctx2.cache_domain.is_cache_hit(rid, m), (rid, m)
            _assert_tables_equal(
                got[rid][m], ctx2.get_data(rid, m), f"reload {rid}.{m}"
            )


def test_batched_mixes_with_cached_runs(tmp_path, runs):
    ctx = _make_ctx(tmp_path, "c", runs)
    pre = ctx.get_data(next(iter(runs)), MEMBERS)  # run_a per-run first
    got = ctx.get_data_batched(list(runs), MEMBERS)
    for m in MEMBERS:
        _assert_tables_equal(pre[m], got["run_a"][m], f"cached run_a.{m}")
    ctx.flush_saves()


def test_batched_mixed_wave_lengths(tmp_path):
    """Runs with different wave lengths pad to the widest and stay exact."""
    runs = {"short": _st(100, L=64, seed=5), "long": _st(120, L=128, seed=6)}
    ctx_ref = _make_ctx(tmp_path, "ref", runs)
    ref = {rid: ctx_ref.get_data(rid, MEMBERS) for rid in runs}

    ctx_b = _make_ctx(tmp_path, "batched", runs)
    got = ctx_b.get_data_batched(list(runs), MEMBERS)
    for rid in runs:
        for m in MEMBERS:
            _assert_tables_equal(ref[rid][m], got[rid][m], f"{rid}.{m}")
    ctx_ref.flush_saves()
    ctx_b.flush_saves()


def test_batched_single_name_return_shape(tmp_path, runs):
    ctx = _make_ctx(tmp_path, "c", runs)
    got = ctx.get_data_batched(list(runs), "basic_features")
    assert set(got) == set(runs)
    for rid in runs:
        assert isinstance(got[rid], Table)
        assert len(got[rid]) == len(runs[rid])
    ctx.flush_saves()


def test_batched_overflow_parity(tmp_path):
    """Dense multi-pulse runs overflow identically batched vs per-run."""
    n = 64
    st = make_fake_st_waveforms(
        n_events=n, wave_length=256, pulse_height=0, polarity="positive",
        seed=9,
    )
    # 24 pulses/waveform: beyond default max_peaks capacity
    waves = np.full((n, 256), 1000.0)
    for k in range(24):
        waves[:, 6 + 10 * k] -= 400.0
    st["wave"] = waves.astype(np.int16)
    st["channel"] = (np.arange(n) % 2).astype(np.int16)
    runs = {"dense_a": st, "dense_b": st.copy()}

    ctx_ref = _make_ctx(tmp_path, "ref", runs)
    ctx_ref.set_config({"hit": {"overflow_policy": "ignore"},
                        "hit_threshold": {"overflow_policy": "ignore"}})
    ref = {rid: ctx_ref.get_data(rid, MEMBERS) for rid in runs}

    ctx_b = _make_ctx(tmp_path, "batched", runs)
    ctx_b.set_config({"hit": {"overflow_policy": "ignore"},
                      "hit_threshold": {"overflow_policy": "ignore"}})
    got = ctx_b.get_data_batched(list(runs), MEMBERS)
    for rid in runs:
        for m in MEMBERS:
            _assert_tables_equal(ref[rid][m], got[rid][m], f"{rid}.{m}")
    ctx_ref.flush_saves()
    ctx_b.flush_saves()


def test_batched_single_member_bundle(tmp_path, runs):
    """Only basic_features registered (config-5 shape): batching still
    engages via plan_batched's single-member relaxation."""

    def mk(sub):
        ctx = Context(storage_dir=str(tmp_path / sub),
                      config={"show_progress": False,
                              "fused_batch_bucket": 256})
        ctx.register(BasicFeaturesPlugin(), DataFramePlugin(),
                     GroupedEventsPlugin())
        for rid, st in runs.items():
            ctx.inject_data(rid, "st_waveforms", st)
        return ctx

    ref_ctx = mk("ref")
    ref = {rid: ref_ctx.get_data(rid, "df_events") for rid in runs}
    b_ctx = mk("batched")
    got = b_ctx.get_data_batched(list(runs), "df_events")
    for rid in runs:
        assert len(got[rid]) == len(ref[rid]), rid
        for col in ref[rid].columns:
            np.testing.assert_array_equal(
                np.asarray(ref[rid][col]), np.asarray(got[rid][col]),
                err_msg=f"{rid}.{col}",
            )
    ref_ctx.flush_saves()
    b_ctx.flush_saves()


def test_batch_processor_device_executor(tmp_path, runs):
    from waveformanalysis_tpu.data.batch_processor import BatchProcessor

    ctx = _make_ctx(tmp_path, "c", runs)
    bp = BatchProcessor(ctx, executor_type="device")
    res = bp.process_runs(list(runs), "df_events")
    assert sorted(res.succeeded) == sorted(runs)
    for rid in runs:
        assert len(res.get(rid).data) == len(runs[rid])
    # outputs are persisted (flush happened inside process_runs)
    ctx2 = _make_ctx(tmp_path, "c", runs)
    for rid in runs:
        assert ctx2.cache_domain.is_cache_hit(rid, "df_events"), rid


def test_batch_processor_device_fallback_isolates_errors(tmp_path, runs):
    """A run that cannot batch (missing data) falls back to the per-run
    loop, preserving on_error='continue' isolation."""
    from waveformanalysis_tpu.data.batch_processor import BatchProcessor

    ctx = _make_ctx(tmp_path, "c", runs)
    bp = BatchProcessor(ctx, executor_type="device", on_error="continue")
    res = bp.process_runs(list(runs) + ["missing_run"], "df_events")
    assert sorted(res.succeeded) == sorted(runs)
    assert res.failed == ["missing_run"]
    ctx.flush_saves()


def test_batched_on_mesh(tmp_path, runs):
    """Batched multi-run dispatch composes with event-axis mesh sharding:
    runs concatenate on the batch axis AND shard over the devices."""
    import jax

    from waveformanalysis_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ctx_ref = _make_ctx(tmp_path, "ref", runs)
    ref = {rid: ctx_ref.get_data(rid, MEMBERS) for rid in runs}

    ctx_m = _make_ctx(tmp_path, "mesh", runs).attach_mesh(make_mesh(8))
    got = ctx_m.get_data_batched(list(runs), MEMBERS)
    for rid in runs:
        for m in MEMBERS:
            _assert_tables_equal(ref[rid][m], got[rid][m], f"{rid}.{m}")
    ctx_ref.flush_saves()
    ctx_m.flush_saves()


def test_batched_per_run_targets_no_overcompute(tmp_path, runs):
    """A run only computes/caches the names pending FOR IT — not the union
    of every run's pending names (exercised via the per-run mapping form
    of run_plugins_batched directly)."""
    ctx = _make_ctx(tmp_path, "c", runs)
    out = ctx.execution_domain.run_plugins_batched(
        ["run_a", "run_b"],
        {"run_a": ["hit"], "run_b": ["basic_features"]},
    )
    assert len(out["run_a"]["hit"]) > 0
    assert len(out["run_b"]["basic_features"]) > 0
    assert "basic_features" not in out["run_a"]
    assert "hit" not in out["run_b"]
    ctx.flush_saves()
    # the cross products were never computed/cached: hit has no
    # basic_features dependency and vice versa
    assert not ctx.cache_domain.is_cache_hit("run_a", "basic_features")
    assert not ctx.cache_domain.is_cache_hit("run_b", "hit")
    assert ctx.cache_domain.is_cache_hit("run_a", "hit")
    assert ctx.cache_domain.is_cache_hit("run_b", "basic_features")


def test_batched_device_resident_waves(tmp_path):
    """Device-backed wave columns concatenate IN HBM for the batched
    program (no host fetch of the resident matrices)."""
    import jax
    import jax.numpy as jnp

    runs = {"d1": _st(60, seed=21), "d2": _st(90, seed=22)}
    ctx_ref = _make_ctx(tmp_path, "ref", runs)
    ref = {rid: ctx_ref.get_data(rid, MEMBERS) for rid in runs}

    dev_runs = {}
    for rid, st in runs.items():
        t = Table.from_numpy(st)
        dev_runs[rid] = t.with_columns(wave=jnp.asarray(st["wave"]))
        assert isinstance(dev_runs[rid]["wave"], jax.Array)
    ctx_b = _make_ctx(tmp_path, "batched", dev_runs)
    got = ctx_b.get_data_batched(list(runs), MEMBERS)
    for rid in runs:
        for m in MEMBERS:
            _assert_tables_equal(ref[rid][m], got[rid][m], f"{rid}.{m}")
    ctx_ref.flush_saves()
    ctx_b.flush_saves()


def test_config_grid_rejects_device_executor(tmp_path, runs):
    from waveformanalysis_tpu.data.batch_processor import BatchProcessor

    ctx = _make_ctx(tmp_path, "c", runs)
    bp = BatchProcessor(ctx, executor_type="device")
    with pytest.raises(ValueError, match="config-grid"):
        bp.process_runs_with_config_grid(
            list(runs), "basic_features", [{"hit": {"height": 10.0}}]
        )


def test_batched_empty_run(tmp_path):
    runs = {"full": _st(50, seed=11), "empty": _st(1, seed=12)[:0]}
    ctx = _make_ctx(tmp_path, "c", runs)
    got = ctx.get_data_batched(list(runs), MEMBERS)
    for m in MEMBERS:
        assert len(got["empty"][m]) == 0, m
        assert len(got["full"]["basic_features"]) == 50
    ctx.flush_saves()
