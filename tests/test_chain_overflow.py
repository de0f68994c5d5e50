"""Overflow contract for fixed-capacity device outputs (VERDICT r1 item 7).

Static device shapes cap peaks/hits at max_peaks/max_hits per waveform;
the reference's Python lists are unbounded (peak_finding.py:446). These
tests pin the policy: counters surface in the chain outputs, `warn` keeps
K entries and logs, `raise` is a strict mode, and under-capacity batches
report zero overflow.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from waveformanalysis_tpu.models.full_chain import (
    ChainConfig,
    ChainOverflowError,
    make_jit_chain,
    run_chain,
)
from waveformanalysis_tpu.plugins.builtin.hit_finder import ThresholdHitPlugin
from waveformanalysis_tpu.plugins.builtin.peak_finding import HitFinderPlugin
from waveformanalysis_tpu.testing.fixtures import make_tiny_context


def _dense_pulse_batch(n_events=8, wave_length=256, n_pulses=14, spacing=16):
    """Square pulse train: n_pulses well-separated pulses per waveform."""
    waves = np.full((n_events, wave_length), 1000.0)
    for k in range(n_pulses):
        c = 10 + k * spacing
        waves[:, c:c + 6] += 400.0
    waves = waves.astype(np.int16)
    return (
        jnp.asarray(waves),
        jnp.asarray(np.full(n_events, wave_length, np.int32)),
        jnp.asarray(np.full(n_events, 1000.0, np.float32)),
        jnp.asarray(np.full(n_events, 1, np.int8)),
    )


CFG = ChainConfig(use_derivative=False, peak_height=80.0,
                  peak_prominence=50.0, peak_width=2.0,
                  max_peaks=8, max_hits=8)


class TestChainOverflowCounters:
    def test_counters_surface_on_dense_batch(self):
        batch = _dense_pulse_batch(n_pulses=14)
        out = make_jit_chain(CFG)(*batch)
        assert int(out["n_peak_overflow"]) == 8  # every event overflows
        assert int(out["n_hit_overflow"]) == 8
        # K strongest-ordered entries were kept, not zero
        assert np.all(np.asarray(out["n_peaks"]) == CFG.max_peaks)
        assert np.all(np.asarray(out["n_hits"]) == CFG.max_hits)

    def test_no_overflow_on_sparse_batch(self):
        batch = _dense_pulse_batch(n_pulses=3, spacing=60)
        out = make_jit_chain(CFG)(*batch)
        assert int(out["n_peak_overflow"]) == 0
        assert int(out["n_hit_overflow"]) == 0
        assert np.all(np.asarray(out["n_peaks"]) == 3)

    def test_raise_policy(self):
        batch = _dense_pulse_batch(n_pulses=14)
        with pytest.raises(ChainOverflowError, match="max_peaks=8"):
            run_chain(*batch, cfg=CFG, overflow_policy="raise")

    def test_warn_policy_logs_and_returns(self, caplog):
        import logging

        batch = _dense_pulse_batch(n_pulses=14)
        with caplog.at_level(logging.WARNING,
                             logger="waveformanalysis_tpu.models.full_chain"):
            out = run_chain(*batch, cfg=CFG, overflow_policy="warn")
        assert out["label"].shape[0] == 8
        assert any("capacity overflow" in r.message for r in caplog.records)

    def test_ignore_policy_silent(self, caplog):
        import logging

        batch = _dense_pulse_batch(n_pulses=14)
        with caplog.at_level(logging.WARNING):
            out = run_chain(*batch, cfg=CFG, overflow_policy="ignore")
        assert int(out["n_peak_overflow"]) == 8
        assert not any("capacity overflow" in r.message for r in caplog.records)

    def test_capacity_bump_clears_overflow(self):
        batch = _dense_pulse_batch(n_pulses=14)
        big = ChainConfig(use_derivative=False, peak_height=80.0,
                          peak_prominence=50.0, peak_width=2.0,
                          max_peaks=16, max_hits=16)
        out = run_chain(*batch, cfg=big, overflow_policy="raise")
        assert int(out["n_peak_overflow"]) == 0
        assert np.all(np.asarray(out["n_peaks"]) == 14)

    def test_sharded_chain_psums_overflow(self):
        import jax

        from waveformanalysis_tpu.models.full_chain import make_sharded_chain
        from waveformanalysis_tpu.parallel.mesh import data_sharding, make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(8)
        batch = _dense_pulse_batch(n_events=16, n_pulses=14)
        sharding = data_sharding(mesh)
        batch = tuple(jax.device_put(x, sharding) for x in batch)
        out = make_sharded_chain(mesh, CFG)(*batch)
        assert int(np.asarray(out["n_peak_overflow"])) == 16


def _dense_st_waveforms(n=16, L=256, n_pulses=14):
    from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms

    st = make_fake_st_waveforms(n_events=n, wave_length=L, pulse_height=0,
                                polarity="positive")
    w = st["wave"].astype(np.float64)
    for k in range(n_pulses):
        c = 10 + k * 16
        w[:, c:c + 6] += 400.0
    st["wave"] = w.astype(np.int16)
    return st


class TestPluginOverflowPolicy:
    def test_hit_plugin_raise_policy(self, tmp_path):
        ctx = make_tiny_context(tmp_path, st_waveforms=_dense_st_waveforms())
        ctx.register(HitFinderPlugin())
        ctx.set_config({"hit": {
            "use_derivative": False, "height": 100.0, "prominence": 50.0,
            "width": 2, "max_peaks_per_waveform": 4,
            "overflow_policy": "raise",
        }})
        with pytest.raises(Exception, match="peak device capacity"):
            ctx.get_data("test_run", "hit")

    def test_hit_plugin_warn_keeps_k(self, tmp_path, caplog):
        import logging

        ctx = make_tiny_context(tmp_path, st_waveforms=_dense_st_waveforms())
        ctx.register(HitFinderPlugin())
        ctx.set_config({"hit": {
            "use_derivative": False, "height": 100.0, "prominence": 50.0,
            "width": 2, "max_peaks_per_waveform": 4,
        }})
        with caplog.at_level(logging.WARNING):
            hits = ctx.get_data("test_run", "hit")
        assert len(hits) == 16 * 4  # K strongest per waveform kept
        assert any("device capacity" in r.message for r in caplog.records)

    def test_threshold_plugin_raise_policy(self, tmp_path):
        ctx = make_tiny_context(tmp_path, st_waveforms=_dense_st_waveforms())
        ctx.register(ThresholdHitPlugin())
        ctx.set_config({"hit_threshold": {
            "threshold": 100.0, "max_hits_per_waveform": 4,
            "overflow_policy": "raise",
        }})
        with pytest.raises(Exception, match="hit capacity"):
            ctx.get_data("test_run", "hit_threshold")

    def test_overflow_policy_untracked_in_lineage(self, tmp_path):
        ctx = make_tiny_context(tmp_path, st_waveforms=_dense_st_waveforms())
        ctx.register(HitFinderPlugin())
        base_cfg = {"use_derivative": False, "height": 100.0,
                    "prominence": 50.0, "width": 2}
        ctx.set_config({"hit": dict(base_cfg, overflow_policy="warn")})
        k1 = ctx.key_for("test_run", "hit")
        ctx.set_config({"hit": dict(base_cfg, overflow_policy="ignore")})
        k2 = ctx.key_for("test_run", "hit")
        assert k1 == k2  # policy is a perf/robustness knob, not lineage
