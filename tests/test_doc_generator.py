"""Doc generator rendering: human/agent variants, index, coverage checker.

Behavioral analog of the reference doc-generator suites
(reference: tests/test_doc_generator.py + tests/test_render_agent_docs.py
over utils/plugin_doc_generator.py:113 and templates/*.j2): rendered pages
carry the spec's options/schema/dependency facts, the agent variant is
terse and hash-stamped, generate_all writes one page per plugin plus an
index, and the coverage checker flags missing/stale pages (the CI contract
in the reference's docs-check workflow).
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.dtypes.schema import Field, Schema
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.plugins.base import Option, Plugin
from waveformanalysis_tpu.utils.plugin_doc_generator import (
    PluginDocGenerator,
    check_doc_coverage,
)

DOC_SCHEMA = Schema(
    "docd",
    (
        Field("value", "f4", unit="ADC", doc="demo value"),
        Field("count", "i4", doc="demo count"),
    ),
)


class SourcePlugin(Plugin):
    provides = "doc_source"
    description = "A source plugin with options and a structured schema."
    version = "1.2.3"
    save_when = "always"
    output_dtype = DOC_SCHEMA
    options = {
        "threshold": Option(default=10.0, type=float, help="Cut threshold"),
        "knob": Option(default="a", type=str, choices=["a", "b"],
                       help="A choice knob"),
        "perf_only": Option(default=4, type=int, track=False,
                            help="Untracked perf knob"),
    }

    def compute(self, context, run_id, **kwargs):
        return Table.zeros(0, DOC_SCHEMA)


class DerivedPlugin(Plugin):
    provides = "doc_derived"
    depends_on = ["doc_source"]
    description = "Depends on doc_source."
    version = "0.1.0"
    save_when = "target"
    output_dtype = DOC_SCHEMA

    def compute(self, context, run_id, **kwargs):
        return Table.zeros(0, DOC_SCHEMA)


class DynamicPlugin(Plugin):
    provides = "doc_dynamic"
    depends_on = []
    description = "Dynamic dependencies."
    version = "0.1.0"
    save_when = "never"
    output_dtype = DOC_SCHEMA
    options = {"use_alt": Option(default=False, type=bool, help="Alt dep")}

    def resolve_depends_on(self, context, run_id=None):
        return ["doc_derived"] if context.get_config(self, "use_alt") \
            else ["doc_source"]

    def compute(self, context, run_id, **kwargs):
        return Table.zeros(0, DOC_SCHEMA)


@pytest.fixture
def ctx(tmp_path):
    ctx = Context(storage_dir=str(tmp_path), config={"show_progress": False})
    ctx.register(SourcePlugin(), DerivedPlugin(), DynamicPlugin())
    return ctx


class TestHumanVariant:
    def test_page_carries_identity_and_options(self, ctx):
        page = PluginDocGenerator(ctx).render_plugin("doc_source")
        assert "`doc_source`" in page and "SourcePlugin" in page
        assert "1.2.3" in page
        assert "`threshold`" in page and "Cut threshold" in page
        # tracked flag rendered per option
        assert "| `perf_only` |" in page
        lines = [ln for ln in page.splitlines() if "`perf_only`" in ln]
        assert "no" in lines[0]

    def test_page_carries_output_schema(self, ctx):
        page = PluginDocGenerator(ctx).render_plugin("doc_source")
        assert "`value`" in page and "ADC" in page and "demo value" in page
        assert "`count`" in page

    def test_source_plugin_shows_no_deps(self, ctx):
        page = PluginDocGenerator(ctx).render_plugin("doc_source")
        assert "nothing (source plugin)" in page

    def test_static_dependency_listed(self, ctx):
        page = PluginDocGenerator(ctx).render_plugin("doc_derived")
        assert "`doc_source`" in page
        assert "save policy:** target" in page

    def test_dynamic_dependency_marked(self, ctx):
        page = PluginDocGenerator(ctx).render_plugin("doc_dynamic")
        assert "dynamic, resolved from config" in page

    def test_unknown_plugin_raises(self, ctx):
        with pytest.raises(KeyError, match="nope"):
            PluginDocGenerator(ctx).render_plugin("nope")

    def test_unknown_variant_raises(self, ctx):
        with pytest.raises(ValueError, match="human|agent"):
            PluginDocGenerator(ctx).render_plugin("doc_source", variant="x")


class TestAgentVariant:
    def test_terse_and_machine_oriented(self, ctx):
        page = PluginDocGenerator(ctx).render_plugin(
            "doc_source", variant="agent"
        )
        assert page.startswith("PLUGIN doc_source")
        assert "version=1.2.3" in page
        assert "threshold" in page
        assert "output_fields=" in page and "value" in page

    def test_spec_hash_stamped_and_stable(self, ctx):
        gen = PluginDocGenerator(ctx)
        a = gen.render_plugin("doc_source", variant="agent")
        b = gen.render_plugin("doc_source", variant="agent")
        assert a == b
        line = next(ln for ln in a.splitlines() if ln.startswith("spec_hash="))
        assert len(line.split("=", 1)[1].strip()) >= 8

    def test_hash_differs_between_plugins(self, ctx):
        gen = PluginDocGenerator(ctx)

        def hash_of(name):
            page = gen.render_plugin(name, variant="agent")
            return next(ln for ln in page.splitlines()
                        if ln.startswith("spec_hash="))

        assert hash_of("doc_source") != hash_of("doc_derived")


class TestGenerateAllAndIndex:
    def test_writes_page_per_plugin_plus_index(self, ctx, tmp_path):
        out = tmp_path / "docs"
        written = PluginDocGenerator(ctx).generate_all(out)
        assert set(written) == {
            "doc_source", "doc_derived", "doc_dynamic", "__index__"
        }
        for path in written.values():
            assert path.exists() and path.read_text()

    def test_index_links_every_plugin(self, ctx):
        index = PluginDocGenerator(ctx).render_index()
        for name in ("doc_source", "doc_derived", "doc_dynamic"):
            assert f"[`{name}`]({name}.md)" in index
        assert "| provides | class | version |" in index

    def test_agent_variant_generate_all(self, ctx, tmp_path):
        out = tmp_path / "agent_docs"
        written = PluginDocGenerator(ctx).generate_all(out, variant="agent")
        body = written["doc_source"].read_text()
        assert body.startswith("PLUGIN doc_source")


class TestCoverageChecker:
    def test_complete_after_generate_all(self, ctx, tmp_path):
        out = tmp_path / "docs"
        PluginDocGenerator(ctx).generate_all(out)
        report = check_doc_coverage(ctx, out)
        assert report["is_complete"]
        assert sorted(report["ok"]) == [
            "doc_derived", "doc_dynamic", "doc_source"
        ]

    def test_missing_page_flagged(self, ctx, tmp_path):
        out = tmp_path / "docs"
        written = PluginDocGenerator(ctx).generate_all(out)
        written["doc_derived"].unlink()
        report = check_doc_coverage(ctx, out)
        assert report["missing"] == ["doc_derived"]
        assert not report["is_complete"]

    def test_stale_page_flagged_on_spec_drift(self, ctx, tmp_path):
        """Editing a page by hand (or changing the plugin) must flag it —
        the reference enforces this in CI (docs-check workflow)."""
        out = tmp_path / "docs"
        written = PluginDocGenerator(ctx).generate_all(out)
        written["doc_source"].write_text("# stale by hand\n")
        report = check_doc_coverage(ctx, out)
        assert report["stale"] == ["doc_source"]
        assert not report["is_complete"]

    def test_version_bump_goes_stale(self, tmp_path):
        out = tmp_path / "docs"
        ctx1 = Context(storage_dir=str(tmp_path / "a"),
                       config={"show_progress": False})
        ctx1.register(SourcePlugin())
        PluginDocGenerator(ctx1).generate_all(out)

        class SourceV2(SourcePlugin):
            version = "2.0.0"

        ctx2 = Context(storage_dir=str(tmp_path / "b"),
                       config={"show_progress": False})
        ctx2.register(SourceV2())
        report = check_doc_coverage(ctx2, out)
        assert report["stale"] == ["doc_source"]
