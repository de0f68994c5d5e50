"""Per-run run_config.json: plugin blocks, hash tracking, cache invalidation.

Mirrors the reference suite
(reference: tests/test_run_config_cache_invalidation.py over
context_config.py:258-430): editing a run's run_config.json invalidates the
cached outputs of every ``uses_run_config`` plugin and its downstream cone —
within a process AND across processes (the previous hash is persisted next
to the run's cached data).
"""

import json
import os

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.dataframe import DataFramePlugin
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms

RUN = "r1"


def _write_run_config(daq_root, payload):
    run_dir = daq_root / RUN
    run_dir.mkdir(parents=True, exist_ok=True)
    path = run_dir / "run_config.json"
    if payload is None:
        if path.exists():
            path.unlink()
        return
    path.write_text(json.dumps(payload))


def _mk_ctx(tmp_path, daq_root):
    ctx = Context(
        storage_dir=str(tmp_path / "store"),
        config={"show_progress": False, "data_root": str(daq_root)},
    )
    ctx.register(BasicFeaturesPlugin(), DataFramePlugin())
    st = make_fake_st_waveforms(n_events=32, pulse_height=300,
                                polarity="positive")
    st["channel"] = (np.arange(32) % 2).astype(np.int16)
    ctx.inject_data(RUN, "st_waveforms", st)
    return ctx


@pytest.fixture()
def daq_root(tmp_path):
    root = tmp_path / "daq"
    root.mkdir()
    return root


def test_run_config_gain_flows_into_df(tmp_path, daq_root):
    _write_run_config(daq_root, {
        "calibration": {"gain_adc_per_pe": {"0:0": 10.0, "0:1": 10.0}},
    })
    ctx = _mk_ctx(tmp_path, daq_root)
    df = ctx.get_data(RUN, "df")
    assert "area_pe" in df.columns
    np.testing.assert_allclose(df["area_pe"], df["area"] / 10.0)
    ctx.flush_saves()


def test_edit_invalidates_within_process(tmp_path, daq_root):
    _write_run_config(daq_root, {
        "calibration": {"gain_adc_per_pe": {"0:0": 10.0, "0:1": 10.0}},
    })
    ctx = _mk_ctx(tmp_path, daq_root)
    df1 = ctx.get_data(RUN, "df")
    np.testing.assert_allclose(df1["area_pe"], df1["area"] / 10.0)

    _write_run_config(daq_root, {
        "calibration": {"gain_adc_per_pe": {"0:0": 20.0, "0:1": 20.0}},
    })
    df2 = ctx.get_data(RUN, "df")
    np.testing.assert_allclose(df2["area_pe"], df2["area"] / 20.0)
    ctx.flush_saves()


def test_edit_invalidates_across_processes(tmp_path, daq_root):
    """A fresh Context (new 'process') over the same storage must NOT serve
    the stale disk cache after run_config changed while nothing ran."""
    _write_run_config(daq_root, {
        "calibration": {"gain_adc_per_pe": {"0:0": 10.0, "0:1": 10.0}},
    })
    ctx1 = _mk_ctx(tmp_path, daq_root)
    df1 = ctx1.get_data(RUN, "df")
    np.testing.assert_allclose(df1["area_pe"], df1["area"] / 10.0)
    ctx1.flush_saves()

    _write_run_config(daq_root, {
        "calibration": {"gain_adc_per_pe": {"0:0": 20.0, "0:1": 20.0}},
    })
    ctx2 = _mk_ctx(tmp_path, daq_root)
    df2 = ctx2.get_data(RUN, "df")
    np.testing.assert_allclose(df2["area_pe"], df2["area"] / 20.0)
    ctx2.flush_saves()


def test_unchanged_run_config_keeps_disk_cache(tmp_path, daq_root):
    _write_run_config(daq_root, {
        "calibration": {"gain_adc_per_pe": {"0:0": 10.0, "0:1": 10.0}},
    })
    ctx1 = _mk_ctx(tmp_path, daq_root)
    ctx1.get_data(RUN, "df")
    ctx1.flush_saves()

    ctx2 = _mk_ctx(tmp_path, daq_root)
    ctx2.config_domain.prepare_request(RUN)
    assert ctx2.cache_domain.is_cache_hit(RUN, "df"), \
        "unchanged run_config must not clear disk caches"
    assert ctx2.cache_domain.is_cache_hit(RUN, "basic_features")


def test_removing_run_config_invalidates(tmp_path, daq_root):
    _write_run_config(daq_root, {
        "calibration": {"gain_adc_per_pe": {"0:0": 10.0, "0:1": 10.0}},
    })
    ctx = _mk_ctx(tmp_path, daq_root)
    df1 = ctx.get_data(RUN, "df")
    assert "area_pe" in df1.columns
    ctx.flush_saves()

    _write_run_config(daq_root, None)  # file removed -> hash None
    df2 = ctx.get_data(RUN, "df")
    assert "area_pe" not in df2.columns
    ctx.flush_saves()


def test_no_run_config_never_invalidates(tmp_path, daq_root):
    ctx = _mk_ctx(tmp_path, daq_root)
    ctx.get_data(RUN, "df")
    ctx.flush_saves()
    ctx2 = _mk_ctx(tmp_path, daq_root)
    ctx2.config_domain.prepare_request(RUN)
    assert ctx2.cache_domain.is_cache_hit(RUN, "df")


def test_channel_metadata_polarity_invalidation(tmp_path, daq_root):
    """run_config channel_metadata polarity feeds the waveform build; an
    edit invalidates st_waveforms (a uses_run_config root) and re-decodes
    with the new truth."""
    from waveformanalysis_tpu.plugins.builtin.waveforms import (
        RawFileNamesPlugin,
        WaveformsPlugin,
    )
    from waveformanalysis_tpu.testing.fixtures import make_synthetic_vx2730_run

    make_synthetic_vx2730_run(str(daq_root), run_name=RUN, n_channels=1,
                              n_rows=8)
    _write_run_config(daq_root, {
        "channel_metadata": {"0:0": {"polarity": "negative"}},
    })
    ctx = Context(
        storage_dir=str(tmp_path / "store"),
        config={"show_progress": False, "data_root": str(daq_root),
                "daq_adapter": "vx2730"},
    )
    ctx.register(RawFileNamesPlugin(), WaveformsPlugin())
    st1 = ctx.get_data(RUN, "st_waveforms")
    assert np.all(np.asarray(st1["polarity"]) == -1)

    _write_run_config(daq_root, {
        "channel_metadata": {"0:0": {"polarity": "positive"}},
    })
    st2 = ctx.get_data(RUN, "st_waveforms")
    assert np.all(np.asarray(st2["polarity"]) == 1)
    ctx.flush_saves()


def test_plugin_block_feeds_resolved_config(tmp_path, daq_root):
    _write_run_config(daq_root, {
        "plugins": {"basic_features": {"fixed_baseline": {"0:0": 950.0}}},
    })
    ctx = _mk_ctx(tmp_path, daq_root)
    resolved = ctx.get_resolved_config("basic_features", RUN)
    assert resolved.get_value("fixed_baseline").value == {"0:0": 950.0}
    # explicit context config wins over the run block
    ctx.set_config({"basic_features": {"fixed_baseline": {"0:0": 920.0}}})
    resolved2 = ctx.get_resolved_config("basic_features", RUN)
    assert resolved2.get_value("fixed_baseline").value == {"0:0": 920.0}


def test_plugins_block_removal_invalidates_across_processes(tmp_path, daq_root):
    """A plugin reading its run_config 'plugins' block recomputes after the
    block is REMOVED — even in a fresh process, via the persisted
    plugin_roots state (the old config is otherwise unknown there)."""
    from typing import Any

    from waveformanalysis_tpu.dtypes.table import Table
    from waveformanalysis_tpu.plugins.base import Plugin

    class BlockEcho(Plugin):
        provides = "block_echo"
        depends_on: tuple = ()
        save_when = "always"
        version = "1.0"

        def compute(self, context: Any, run_id: str, **kw: Any) -> Table:
            block = context.config_domain.get_plugin_run_config(
                run_id, "block_echo"
            )
            return Table({"scale": np.full(4, block.get("scale", 1.0))})

    def mk():
        ctx = Context(storage_dir=str(tmp_path / "store"),
                      config={"show_progress": False,
                              "data_root": str(daq_root)})
        ctx.register(BlockEcho())
        return ctx

    _write_run_config(daq_root, {"plugins": {"block_echo": {"scale": 7.0}}})
    ctx1 = mk()
    out1 = ctx1.get_data(RUN, "block_echo")
    assert np.all(np.asarray(out1["scale"]) == 7.0)
    ctx1.flush_saves()

    _write_run_config(daq_root, {})  # plugins block removed entirely
    ctx2 = mk()  # fresh "process"
    out2 = ctx2.get_data(RUN, "block_echo")
    assert np.all(np.asarray(out2["scale"]) == 1.0), \
        "stale block-era cache served after the plugins block was removed"
    ctx2.flush_saves()


def test_uses_run_config_roots_registered(tmp_path, daq_root):
    ctx = _mk_ctx(tmp_path, daq_root)
    roots = set(ctx.config_domain.run_config_roots())
    assert {"basic_features", "df"} <= roots
