"""Legacy events_df/events_grouped names stay removed — no silent migration.

Mirrors the reference suite (reference: tests/test_events_df_convergence.py
over core/context.py:187-190): the renamed data names raise a migration
pointer, and legacy ``events_df.*`` / ``events_grouped.*`` config keys are
NOT migrated onto the df / df_events plugins — they are simply inert.

Deliberate divergence from the reference, locked in here: the reference
raises ``ValueError`` for removed data names, while this build raises
``KeyError`` (``context.py _unknown_name_error``) so except-clauses match
the dict-lookup idiom of ``get_data``. Users porting reference code that
catches ``ValueError`` must widen to ``(ValueError, KeyError)``. Also
documented in docs/PARITY.md.
"""

import pytest

from waveformanalysis_tpu.context.context import (
    Context,
    REMOVED_DATA_NAME_ALIASES,
)
from waveformanalysis_tpu.plugins.base import Option, Plugin


class _DFGainEchoPlugin(Plugin):
    provides = "df"
    depends_on = []
    version = "1.0.0"
    save_when = "never"
    options = {"gain_adc_per_pe": Option(default=None, type=dict)}

    def compute(self, context, run_id, **kwargs):
        return {"gain": context.get_config(self, "gain_adc_per_pe")}


class _DFEventsEchoPlugin(Plugin):
    provides = "df_events"
    depends_on = []
    version = "1.0.0"
    save_when = "never"
    options = {"time_window_ns": Option(default=100.0, type=float)}

    def compute(self, context, run_id, **kwargs):
        return {
            "time_window_ns": context.get_config(self, "time_window_ns"),
            "use_numba": context.config.get("use_numba"),
            "n_processes": context.config.get("n_processes"),
        }


def _ctx(tmp_path, config=None):
    cfg = {"show_progress": False}
    cfg.update(config or {})
    return Context(storage_dir=str(tmp_path / "store"), config=cfg)


def test_alias_table_matches_reference_names():
    assert REMOVED_DATA_NAME_ALIASES == {
        "events_df": "df",
        "events_grouped": "df_events",
    }


def test_removed_events_df_data_name_raises_migration_error(tmp_path):
    ctx = _ctx(tmp_path)
    with pytest.raises(KeyError, match="events_df.*removed.*'df'"):
        ctx.get_data("run_001", "events_df")


def test_removed_events_grouped_data_name_raises_migration_error(tmp_path):
    ctx = _ctx(tmp_path)
    with pytest.raises(KeyError, match="events_grouped.*removed.*'df_events'"):
        ctx.get_data("run_001", "events_grouped")


def test_legacy_events_df_gain_config_no_longer_migrates(tmp_path):
    ctx = _ctx(tmp_path, {"events_df.gain_adc_per_pe": {"0": 12.5}})
    ctx.register(_DFGainEchoPlugin())

    result = ctx.get_data("run_001", "df")

    assert result["gain"] is None
    # the legacy key is inert but untouched
    assert ctx.config["events_df.gain_adc_per_pe"] == {"0": 12.5}


def test_legacy_events_df_gain_is_ignored_even_when_df_config_exists(tmp_path):
    ctx = _ctx(
        tmp_path,
        {
            "df.gain_adc_per_pe": {"0": 3.0},
            "events_df.gain_adc_per_pe": {"0": 12.5},
        },
    )
    ctx.register(_DFGainEchoPlugin())

    result = ctx.get_data("run_001", "df")

    assert result["gain"] == {"0": 3.0}
    assert ctx.config["events_df.gain_adc_per_pe"] == {"0": 12.5}


def test_legacy_removed_events_df_config_keys_are_ignored(tmp_path):
    ctx = _ctx(tmp_path, {"events_df.include_event_id": False})
    ctx.register(_DFGainEchoPlugin())

    result = ctx.get_data("run_001", "df")
    assert result["gain"] is None


def test_legacy_events_grouped_config_no_longer_migrates(tmp_path):
    ctx = _ctx(
        tmp_path,
        {
            "events_grouped.time_window_ns": 3.5,
            "events_grouped.use_numba": False,
            "events_grouped.n_processes": 4,
        },
    )
    ctx.register(_DFEventsEchoPlugin())

    result = ctx.get_data("run_001", "df_events")

    assert result["time_window_ns"] == 100.0
    assert result["use_numba"] is None
    assert result["n_processes"] is None
    assert ctx.config["events_grouped.time_window_ns"] == 3.5
    assert ctx.config["events_grouped.use_numba"] is False
    assert ctx.config["events_grouped.n_processes"] == 4


def test_batched_request_also_raises_migration_error(tmp_path):
    ctx = _ctx(tmp_path)
    with pytest.raises(KeyError, match="removed"):
        ctx.get_data_batched(["run_001", "run_002"], "events_df")
