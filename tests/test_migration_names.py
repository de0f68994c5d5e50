"""Removed legacy data names: migration pointers, legacy config ignored.

Mirrors the reference convergence suite
(reference: tests/test_events_df_convergence.py + core/context.py:187-190
_REMOVED_DATA_NAME_ALIASES): the long-removed ``events_df`` /
``events_grouped`` names raise errors that point at their replacements
(``df`` / ``df_events``) across every read entry point, and legacy config
blocks under the removed names are ignored rather than migrated.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import (
    Context,
    REMOVED_DATA_NAME_ALIASES,
)
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.dataframe import DataFramePlugin
from waveformanalysis_tpu.plugins.builtin.event_analysis import GroupedEventsPlugin
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms


@pytest.fixture()
def ctx(tmp_path):
    c = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    c.register(BasicFeaturesPlugin(), DataFramePlugin(), GroupedEventsPlugin())
    c.inject_data("r", "st_waveforms", make_fake_st_waveforms(n_events=32))
    return c


def test_alias_map_contents():
    assert REMOVED_DATA_NAME_ALIASES == {
        "events_df": "df",
        "events_grouped": "df_events",
    }


@pytest.mark.parametrize("legacy,replacement", [
    ("events_df", "df"), ("events_grouped", "df_events"),
])
def test_removed_name_raises_migration_error(ctx, legacy, replacement):
    with pytest.raises(KeyError, match=f"removed.*'{replacement}'"):
        ctx.get_data("r", legacy)


def test_removed_name_in_multi_target_list(ctx):
    with pytest.raises(KeyError, match="removed.*'df'"):
        ctx.get_data("r", ["basic_features", "events_df"])


def test_removed_name_in_batched_read(ctx):
    with pytest.raises(KeyError, match="removed.*'df_events'"):
        ctx.get_data_batched(["r"], "events_grouped")


def test_unknown_name_error_lists_registered(ctx):
    with pytest.raises(KeyError, match="No plugin registered"):
        ctx.get_data("r", "not_a_thing")


def test_replacements_resolve(ctx):
    df = ctx.get_data("r", "df")
    ev = ctx.get_data("r", "df_events")
    assert len(df) == 32 and len(ev) > 0
    ctx.flush_saves()


def test_legacy_config_block_is_ignored(ctx):
    """A config block under a removed name neither migrates nor breaks the
    replacement's lineage (reference: legacy events_df gain no longer
    migrates)."""
    key_before = ctx.key_for("r", "df")
    ctx.set_config({"events_df": {"gain_adc_per_pe": {"0:0": 10.0}}})
    assert ctx.key_for("r", "df") == key_before
    df = ctx.get_data("r", "df")
    # gain columns only appear when configured on the LIVE name
    assert "area_pe" not in df.columns
    ctx.flush_saves()


def test_live_name_config_still_applies(ctx):
    ctx.set_config({"df": {"gain_adc_per_pe": {"0:0": 10.0}}})
    df = ctx.get_data("r", "df")
    assert "area_pe" in df.columns
    ctx.flush_saves()


def test_registering_replacement_unaffected_by_alias(tmp_path):
    """The alias map only intercepts UNKNOWN names: a context where 'df' is
    live never routes through it."""
    c = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    c.register(BasicFeaturesPlugin(), DataFramePlugin())
    c.inject_data("r", "st_waveforms", make_fake_st_waveforms(n_events=8))
    assert len(c.get_data("r", "df")) == 8
    c.flush_saves()
