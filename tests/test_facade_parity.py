"""Facade parity with the reference package root
(reference: waveform_analysis/__init__.py lazy names) + the
waveform-struct decoupling surface (reference:
tests/test_waveform_struct_decoupling.py)."""

import numpy as np
import pytest

import waveformanalysis_tpu as wfa

# every name the reference exposes from its package root must resolve here
REFERENCE_FACADE = [
    "CacheManager", "CompressionManager", "Context", "DAQAnalyzer",
    "DAQRun", "EXECUTOR_CONFIGS", "ErrorContext", "ErrorSeverity",
    "IntegrityChecker", "MemmapStorage", "Option", "Plugin", "PluginError",
    "PluginHotReloader", "StorageBackend", "StreamingContext",
    "StreamingPlugin", "WaveformPreviewer", "WaveformStruct",
    "WaveformStructConfig", "enable_hot_reload", "get_config",
    "get_executor", "get_executor_manager", "get_streaming_context",
    "get_timeout_manager", "group_multi_channel_hits", "parallel_apply",
    "parallel_map", "plot_records_waveforms", "preview_waveforms",
    "register_config",
]


@pytest.mark.parametrize("name", REFERENCE_FACADE)
def test_reference_facade_name_resolves(name):
    obj = getattr(wfa, name)
    assert obj is not None
    assert name in wfa.__all__


class TestExecutorConfigRegistry:
    def test_get_config_returns_copy(self):
        cfg = wfa.get_config("io_intensive")
        cfg["max_workers"] = 1
        assert wfa.get_config("io_intensive")["max_workers"] != 1

    def test_get_config_unknown_raises(self):
        with pytest.raises(KeyError, match="available"):
            wfa.get_config("nope")

    def test_register_config_roundtrip(self):
        wfa.register_config("_test_cfg",
                            {"executor_type": "thread", "max_workers": 2})
        try:
            assert wfa.get_config("_test_cfg")["max_workers"] == 2
        finally:
            wfa.EXECUTOR_CONFIGS.pop("_test_cfg", None)


class TestSingletonAccessors:
    def test_executor_manager_is_singleton(self):
        assert wfa.get_executor_manager() is wfa.get_executor_manager()

    def test_timeout_manager_runs_work(self):
        tm = wfa.get_timeout_manager()
        assert tm.run_with_timeout(lambda: 7, 5.0) == 7


class TestErrorContext:
    def test_fields_and_dict(self):
        ec = wfa.ErrorContext(run_id="r1", plugin_name="hit",
                              plugin_class="HitFinderPlugin",
                              config={"height": 30.0}, timestamp="t")
        d = ec.to_dict()
        assert d["run_id"] == "r1"
        assert d["config"] == {"height": 30.0}
        assert d["memory_mb"] is None

    def test_from_snapshot(self):
        from waveformanalysis_tpu.foundation.error import ErrorManager

        class _P:
            provides = "hit"
            version = "1.0"

        snap = ErrorManager().collect_context(plugin=_P())
        ec = wfa.ErrorContext.from_snapshot(snap, run_id="r9")
        assert ec.plugin_class == "_P"
        assert ec.plugin_name == "hit"
        assert ec.run_id == "r9"
        assert ec.timestamp  # stamped


class TestWaveformStructConfig:
    def test_default_vx2730(self):
        cfg = wfa.WaveformStructConfig.default_vx2730()
        assert cfg.format_spec.name == "vx2730_csv"
        assert cfg.wave_length is None
        from waveformanalysis_tpu.dtypes.schema import DEFAULT_WAVE_LENGTH

        assert cfg.get_wave_length() == DEFAULT_WAVE_LENGTH

    def test_from_adapter(self):
        cfg = wfa.WaveformStructConfig.from_adapter("vx2730")
        assert cfg.format_spec.name == "vx2730_csv"
        assert cfg.wave_length is None

    def test_wave_length_priority(self):
        from waveformanalysis_tpu.formats.vx2730 import VX2730_SPEC

        assert wfa.WaveformStructConfig(
            VX2730_SPEC, wave_length=1000).get_wave_length() == 1000

    def test_get_record_dtype(self):
        from waveformanalysis_tpu.formats.vx2730 import VX2730_SPEC

        dt = wfa.WaveformStructConfig(
            VX2730_SPEC, wave_length=64).get_record_dtype()
        assert dt["wave"].shape == (64,)

    def test_make_struct_structures(self):
        from waveformanalysis_tpu.formats.vx2730 import VX2730_SPEC

        cols = VX2730_SPEC.columns
        n_meta = cols.samples_start
        rows = np.zeros((3, n_meta + 8))
        rows[:, cols.timestamp] = [1000, 2000, 3000]
        rows[:, cols.channel] = 0
        rows[:, n_meta:] = 1000.0
        cfg = wfa.WaveformStructConfig(VX2730_SPEC, wave_length=8)
        st = cfg.make_struct([rows], dt_ns=2).structure_waveforms()
        assert len(st) == 3
        assert np.asarray(st["wave"]).shape[1] == 8
