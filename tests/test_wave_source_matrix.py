"""Dynamic wave-source resolution matrix (reference analog:
_wave_source.py:93-229): auto preference order (filtered > records >
st_waveforms), explicit overrides, dynamic depends_on rewiring, invalid
values, and lineage effects of a source switch.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.builtin._wave_source import (
    resolve_wave_input_spec,
)
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.filtering import FilteredWaveformsPlugin
from waveformanalysis_tpu.plugins.builtin.records import (
    RecordsPlugin,
    WavePoolPlugin,
)
from waveformanalysis_tpu.plugins.builtin.waveforms import (
    RawFileNamesPlugin,
    WaveformsPlugin,
)
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms
from utils import create_daq_run


def _ctx(tmp_path, *plugins, **cfg):
    config = {"show_progress": False}
    config.update(cfg)
    ctx = Context(storage_dir=str(tmp_path / "s"), config=config)
    ctx.register(BasicFeaturesPlugin(), RawFileNamesPlugin(), *plugins)
    return ctx


class TestAutoPreference:
    def test_auto_ignores_registered_records(self, tmp_path):
        """Reference semantics (cpu/_wave_source.py:103-112): auto NEVER
        selects records, even when the RecordsPlugin is registered — the
        records source must be requested explicitly. (Round-4 change: the
        old auto->records preference produced reference-divergent
        record_id/event_index identities; caught by the differential
        oracle, see docs/PARITY.md.)"""
        ctx = _ctx(tmp_path, WaveformsPlugin(), RecordsPlugin(), WavePoolPlugin())
        spec = resolve_wave_input_spec(ctx, ctx.get_plugin("basic_features"))
        assert spec.source == "st_waveforms"
        assert spec.depends_on == ("st_waveforms",)
        ctx.set_config({"basic_features": {"wave_source": "records"}})
        spec = resolve_wave_input_spec(ctx, ctx.get_plugin("basic_features"))
        assert spec.source == "records"
        assert spec.depends_on == ("records", "wave_pool")

    def test_auto_falls_back_to_st(self, tmp_path):
        ctx = _ctx(tmp_path, WaveformsPlugin())
        spec = resolve_wave_input_spec(ctx, ctx.get_plugin("basic_features"))
        assert spec.source == "st_waveforms"
        assert spec.depends_on == ("st_waveforms",)

    def test_use_filtered_beats_records(self, tmp_path):
        ctx = _ctx(tmp_path, WaveformsPlugin(), RecordsPlugin(),
                   WavePoolPlugin(), FilteredWaveformsPlugin())
        ctx.set_config({"basic_features": {"use_filtered": True}})
        spec = resolve_wave_input_spec(ctx, ctx.get_plugin("basic_features"))
        assert spec.source == "filtered_waveforms"

    def test_use_filtered_without_registration_ignored(self, tmp_path):
        ctx = _ctx(tmp_path, WaveformsPlugin())
        ctx.set_config({"basic_features": {"use_filtered": True}})
        spec = resolve_wave_input_spec(ctx, ctx.get_plugin("basic_features"))
        assert spec.source == "st_waveforms"

    def test_explicit_overrides_auto(self, tmp_path):
        ctx = _ctx(tmp_path, WaveformsPlugin(), RecordsPlugin(), WavePoolPlugin())
        ctx.set_config({"basic_features": {"wave_source": "st_waveforms"}})
        spec = resolve_wave_input_spec(ctx, ctx.get_plugin("basic_features"))
        assert spec.source == "st_waveforms"

    def test_invalid_source_raises(self, tmp_path):
        ctx = _ctx(tmp_path, WaveformsPlugin())
        ctx.set_config({"basic_features": {"wave_source": "telepathy"}})
        with pytest.raises(ValueError, match="invalid wave_source"):
            resolve_wave_input_spec(ctx, ctx.get_plugin("basic_features"))


class TestDynamicDependsOn:
    def test_plan_rewires_with_source(self, tmp_path):
        ctx = _ctx(tmp_path, WaveformsPlugin(), RecordsPlugin(), WavePoolPlugin())
        plan_auto = ctx.execution_domain.resolve_execution_plan("basic_features")
        assert "records" not in plan_auto  # auto = st (reference semantics)
        assert "st_waveforms" in plan_auto
        ctx.set_config({"basic_features": {"wave_source": "records"}})
        plan_rec = ctx.execution_domain.resolve_execution_plan("basic_features")
        assert "records" in plan_rec and "wave_pool" in plan_rec
        assert "st_waveforms" not in plan_rec

    def test_source_switch_rotates_lineage(self, tmp_path):
        ctx = _ctx(tmp_path, WaveformsPlugin(), RecordsPlugin(), WavePoolPlugin())
        k_auto = ctx.key_for("r", "basic_features")
        ctx.set_config({"basic_features": {"wave_source": "st_waveforms"}})
        k_st = ctx.key_for("r", "basic_features")
        assert k_auto != k_st


class TestNumericEquivalence:
    def test_records_vs_st_same_features(self, tmp_path):
        """Same raw run through both sources: identical areas/heights.

        records carries the same waves + baselines as st_waveforms for
        fixed-length VX2730 data, so the feature kernel must agree.
        """
        create_daq_run(tmp_path / "daq", "rr", n_channels=2, n_rows=10,
                       n_samples=48)
        base_cfg = {
            "data_root": str(tmp_path / "daq"), "daq_adapter": "vx2730",
        }
        ctx = _ctx(tmp_path, WaveformsPlugin(), RecordsPlugin(),
                   WavePoolPlugin(), **base_cfg)
        ctx.set_config({"basic_features": {"wave_source": "records"}})
        f_rec = ctx.get_data("rr", "basic_features")

        ctx2 = Context(storage_dir=str(tmp_path / "s2"),
                       config=dict(base_cfg, show_progress=False))
        ctx2.register(BasicFeaturesPlugin(), RawFileNamesPlugin(),
                      WaveformsPlugin())
        ctx2.set_config({"basic_features": {"wave_source": "st_waveforms"}})
        f_st = ctx2.get_data("rr", "basic_features")

        assert len(f_rec) == len(f_st) == 20
        # align by timestamp (row orders differ: records are time-merged)
        o1 = np.argsort(np.asarray(f_rec["timestamp"]), kind="stable")
        o2 = np.argsort(np.asarray(f_st["timestamp"]), kind="stable")
        np.testing.assert_allclose(
            np.asarray(f_rec["area"])[o1], np.asarray(f_st["area"])[o2],
            rtol=0, atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(f_rec["height"])[o1], np.asarray(f_st["height"])[o2],
            rtol=0, atol=0,
        )
