"""Option-surface parity gate vs the live reference package.

The r4 config-sweep differential caught several bugs of one class: a
reference option that this build either lacked or defaulted differently,
so a ported config silently changed meaning (merge defaults,
start_channel_slice, hit_merge scoping). This gate kills the class:

1. every option key on every reference builtin plugin must exist on the
   same-named plugin here (or be listed in DOCUMENTED_MISSING with a
   docs/PARITY.md pointer), and
2. every shared option's DEFAULT must match the reference (or be listed in
   DOCUMENTED_DEFAULT_DIVERGENCES).

Plus the enforcement side: Context.set_config must WARN when a
plugin-scoped dict carries a key that matches no registered option (the
silent-acceptance repro from VERDICT r4 Weak #2).

Reference option tables: /root/reference/waveform_analysis/core/plugins/
builtin/cpu/*.py (e.g. waveforms.py:1045, records.py:220-254,
peak_finding.py:127-146, event_analysis.py:79).
"""

from __future__ import annotations

import sys
import warnings

import pytest

REF_PATH = "/root/reference"

pytestmark = pytest.mark.slow


# Reference option keys deliberately NOT implemented here. Empty by design:
# every key the reference accepts is accepted here (CPU-only perf knobs are
# declared untracked and inert — see docs/PARITY.md "Inert reference
# options"). Add entries only with a PARITY.md ledger line.
DOCUMENTED_MISSING: dict = {}

# (data_name, option) -> reason, for shared options whose DEFAULT
# deliberately differs from the reference. Empty by design.
DOCUMENTED_DEFAULT_DIVERGENCES: dict = {}


def _ref_option_tables():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        from waveform_analysis.core.plugins import profiles
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference package not importable: {e}")
    tables = {}
    for plugin in profiles.cpu_default():
        provides = plugin.provides
        names = provides if isinstance(provides, (list, tuple)) else [provides]
        for name in names:
            tables[name] = dict(plugin.options)
    return tables


def _our_option_tables():
    from waveformanalysis_tpu.plugins import plugin_sets

    tables = {}
    for plugin in plugin_sets.cpu_default():
        provides = plugin.provides
        names = provides if isinstance(provides, (list, tuple)) else [provides]
        for name in names:
            tables[name] = dict(plugin.options)
    return tables


class TestOptionSurfaceParity:
    def test_every_reference_plugin_exists(self):
        ref, ours = _ref_option_tables(), _our_option_tables()
        missing_plugins = sorted(set(ref) - set(ours))
        assert not missing_plugins, (
            f"reference provides names with no plugin here: {missing_plugins}"
        )

    def test_every_reference_option_exists_or_is_ledgered(self):
        ref, ours = _ref_option_tables(), _our_option_tables()
        holes = []
        for name in sorted(set(ref) & set(ours)):
            documented = set(DOCUMENTED_MISSING.get(name, ()))
            for key in sorted(set(ref[name]) - set(ours[name]) - documented):
                holes.append(f"{name}.{key}")
        assert not holes, (
            "reference options missing here and not ledgered in "
            f"DOCUMENTED_MISSING / docs/PARITY.md: {holes}"
        )

    def test_documented_missing_entries_still_exist_in_reference(self):
        # keeps the ledger honest: an entry for a key the reference no
        # longer has is stale and must be dropped
        ref = _ref_option_tables()
        stale = [
            f"{name}.{key}"
            for name, keys in DOCUMENTED_MISSING.items()
            for key in keys
            if key not in ref.get(name, {})
        ]
        assert not stale, f"stale DOCUMENTED_MISSING entries: {stale}"

    def test_shared_option_defaults_match(self):
        ref, ours = _ref_option_tables(), _our_option_tables()
        diffs = []
        for name in sorted(set(ref) & set(ours)):
            for key in sorted(set(ref[name]) & set(ours[name])):
                if (name, key) in DOCUMENTED_DEFAULT_DIVERGENCES:
                    continue
                rd = ref[name][key].default
                od = ours[name][key].default
                if rd != od and not (rd is None and od is None):
                    diffs.append(f"{name}.{key}: ref={rd!r} ours={od!r}")
        assert not diffs, (
            "shared option defaults diverge from the reference (add a "
            f"DOCUMENTED_DEFAULT_DIVERGENCES entry + PARITY.md line): {diffs}"
        )


class TestSetConfigUnknownKeyWarning:
    @pytest.fixture()
    def ctx(self, tmp_path):
        from waveformanalysis_tpu.context.context import Context
        from waveformanalysis_tpu.plugins import plugin_sets

        ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
        ctx.register(*plugin_sets.cpu_default())
        return ctx

    def test_unknown_scoped_key_warns(self, ctx):
        with pytest.warns(UserWarning, match="no option of that plugin"):
            ctx.set_config({"st_waveforms": {"definitely_not_an_option": 1}})

    def test_known_scoped_key_is_silent(self, ctx):
        # the VERDICT r4 repro: streaming_mode is now a real option
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ctx.set_config({"st_waveforms": {"streaming_mode": True}})

    def test_compat_alias_is_silent(self, ctx):
        # part_size -> records_part_size alias resolves before the check
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            ctx.set_config({"records": {"part_size": 100_000}})

    def test_global_keys_stay_freeform(self, ctx):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ctx.set_config({"my_custom_global": {"anything": 1}})
            ctx.set_config({"n_channels": 4})

    def test_unregistered_scope_is_silent_at_set_time(self, ctx):
        # plugins registered later are checked at execution time instead
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ctx.set_config({"late_plugin": {"some_key": 1}})
