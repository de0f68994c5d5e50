"""Quality/dev-tooling scripts: scaffold, schema compat, change impact, perf.

Behavioral analog of the reference tooling tests
(reference: tests/test_agent_quality_checks.py + scripts/ tree): the
scaffolder emits a loadable plugin + test pair, the schema snapshot
detects breaking drift, change-impact maps files to affected plugins, and
the perf regression harness measures a synthetic run.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(script, *args, env=None):
    import os

    full_env = dict(os.environ)
    full_env.update({"JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu"})
    full_env.update(env or {})
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *args],
        capture_output=True, text=True, cwd=str(REPO), env=full_env,
        timeout=240,
    )


class TestScaffoldPlugin:
    def test_generates_loadable_plugin_and_test(self, tmp_path):
        r = _run("scaffold_plugin.py", "my_feature",
                 "--out-dir", str(tmp_path), "--test-dir", str(tmp_path))
        assert r.returncode == 0, r.stderr
        files = sorted(p.name for p in tmp_path.glob("*.py"))
        assert len(files) == 2  # plugin + test
        src = next(tmp_path.glob("*my_feature*.py")).read_text()
        assert "my_feature" in src and "Plugin" in src

        # the generated plugin imports and registers cleanly
        from waveformanalysis_tpu.context.context import Context
        from waveformanalysis_tpu.plugins.loader import PluginLoader

        classes = PluginLoader().discover_directory(str(tmp_path))
        assert any(c.provides == "my_feature" for c in classes)
        ctx = Context(storage_dir=str(tmp_path / "cache"),
                      config={"show_progress": False})
        ctx.register(next(c for c in classes if c.provides == "my_feature")())
        assert ctx.get_plugin("my_feature") is not None


class TestSchemaCompatCheck:
    def test_snapshot_matches_checked_in_baseline(self):
        """docs/schema_snapshot.json must track the live schemas — the
        reference enforces doc/schema drift in CI."""
        r = _run("schema_compat_check.py")
        assert r.returncode == 0, r.stdout + r.stderr

    def test_detects_breaking_drift(self, tmp_path):
        snap_path = REPO / "docs" / "schema_snapshot.json"
        mutated = json.loads(snap_path.read_text())
        # simulate drift: the stored snapshot claims an extra field the
        # live schema no longer has (a removed-field break)
        name = "basic_features"
        mutated[name]["fields"]["ghost_field"] = "<f4"
        alt = tmp_path / "snap.json"
        alt.write_text(json.dumps(mutated))
        r = _run("schema_compat_check.py", "--snapshot", str(alt))
        assert r.returncode != 0
        assert name in (r.stdout + r.stderr)


class TestChangeImpact:
    def test_maps_kernel_file_to_consumers(self):
        r = _run("assess_change_impact.py", "--file",
                 "waveformanalysis_tpu/ops/widths.py")
        assert r.returncode == 0, r.stderr
        out = r.stdout
        assert "waveform_width" in out

    def test_unknown_plugin_errors_cleanly(self):
        r = _run("assess_change_impact.py", "not_a_plugin")
        assert r.returncode != 0
        assert "unknown plugin" in r.stderr


class TestPerfRegressionHarness:
    def test_measures_targets_on_synthetic_run(self):
        r = _run("performance_regression_check.py", "--targets",
                 "basic_features", "--reps", "1")
        assert r.returncode == 0, r.stderr[-500:]
        assert "basic_features" in r.stdout


class TestDocSyncCheck:
    def test_committed_docs_in_sync_both_variants(self):
        res = _run("check_doc_sync.py")
        assert res.returncode == 0, res.stdout + res.stderr
        assert "doc-sync OK [human]" in res.stdout
        assert "doc-sync OK [agent]" in res.stdout

    def test_detects_drift_in_single_dir_mode(self, tmp_path):
        import shutil

        drifted = tmp_path / "plugins"
        shutil.copytree(REPO / "docs" / "plugins", drifted,
                        ignore=shutil.ignore_patterns("agent"))
        page = drifted / "hit.md"
        page.write_text(page.read_text() + "\nhand edit\n")
        res = _run("check_doc_sync.py", "--docs-dir", str(drifted))
        assert res.returncode == 1
        assert "hit.md: content drift" in res.stdout

    def test_detects_missing_page(self, tmp_path):
        import shutil

        drifted = tmp_path / "agent"
        shutil.copytree(REPO / "docs" / "plugins" / "agent", drifted)
        (drifted / "hit.md").unlink()
        res = _run("check_doc_sync.py", "--docs-dir", str(drifted),
                   "--variant", "agent")
        assert res.returncode == 1
        assert "hit.md: missing from committed docs" in res.stdout
