"""Hot reload: source-change detection, re-registration, cache clearing.

Behavioral analog of the reference hot-reload suite
(reference: core/plugins/core/hot_reload.py:33-288): plugins loaded from a
source file re-register when the file changes, their caches invalidate,
the background poll thread starts and stops cleanly, and failed reloads
never break the running Context.
"""

import textwrap
import time

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.hot_reload import (
    PluginHotReloader,
    enable_hot_reload,
)
from waveformanalysis_tpu.plugins.loader import PluginLoader

PLUGIN_SRC_V1 = textwrap.dedent('''
    import numpy as np
    from waveformanalysis_tpu.plugins.base import Plugin

    class HotPlugin(Plugin):
        provides = "hot_data"
        version = "1.0.0"
        save_when = "always"

        def compute(self, context, run_id, **kwargs):
            out = np.zeros(4, dtype=[("v", "i4")])
            out["v"] = 1
            return out
''')

PLUGIN_SRC_V2 = PLUGIN_SRC_V1.replace('"1.0.0"', '"2.0.0"').replace(
    'out["v"] = 1', 'out["v"] = 2'
)

PLUGIN_SRC_BROKEN = PLUGIN_SRC_V1.replace(
    "import numpy as np", "import numpy as np\nraise RuntimeError('bad edit')"
)


@pytest.fixture
def hot_ctx(tmp_path):
    src = tmp_path / "hot_plugin_mod.py"
    src.write_text(PLUGIN_SRC_V1)
    ctx = Context(storage_dir=str(tmp_path / "cache"),
                  config={"show_progress": False})
    loader = PluginLoader()
    classes = loader.discover_directory(str(tmp_path))
    ctx.register(*(cls() for cls in classes))
    assert ctx.get_plugin("hot_data") is not None
    return ctx, src


def _touch(src, content):
    # mtime granularity: ensure both mtime and sha change
    time.sleep(0.02)
    src.write_text(content)


class TestChangeDetection:
    def test_no_change_no_reload(self, hot_ctx):
        ctx, src = hot_ctx
        r = enable_hot_reload(ctx)
        assert r.changed_modules() == []
        assert r.check_and_reload() == []
        assert r.reload_count == 0

    def test_change_detected_and_reloaded(self, hot_ctx):
        ctx, src = hot_ctx
        r = enable_hot_reload(ctx)
        out1 = ctx.get_data("r", "hot_data")
        assert int(np.asarray(out1["v"])[0]) == 1

        _touch(src, PLUGIN_SRC_V2)
        assert r.changed_modules()
        reloaded = r.check_and_reload()
        assert reloaded == ["hot_data"]
        assert r.reload_count == 1
        assert ctx.get_plugin("hot_data").version == "2.0.0"

    def test_reload_clears_caches_and_recomputes(self, hot_ctx):
        ctx, src = hot_ctx
        r = enable_hot_reload(ctx)
        ctx.get_data("r", "hot_data")
        ctx.flush_saves()
        _touch(src, PLUGIN_SRC_V2)
        r.check_and_reload()
        out2 = ctx.get_data("r", "hot_data")
        assert int(np.asarray(out2["v"])[0]) == 2  # new code ran

    def test_version_change_changes_lineage(self, hot_ctx):
        ctx, src = hot_ctx
        r = enable_hot_reload(ctx)
        key1 = ctx.key_for("r", "hot_data")
        _touch(src, PLUGIN_SRC_V2)
        r.check_and_reload()
        assert ctx.key_for("r", "hot_data") != key1

    def test_broken_edit_keeps_old_plugin_running(self, hot_ctx):
        ctx, src = hot_ctx
        r = enable_hot_reload(ctx)
        _touch(src, PLUGIN_SRC_BROKEN)
        reloaded = r.check_and_reload()   # swallows the import error
        assert reloaded == []
        out = ctx.get_data("r", "hot_data")  # old version still serves
        assert int(np.asarray(out["v"])[0]) == 1


class TestBackgroundPolling:
    def test_start_stop_idempotent(self, hot_ctx):
        ctx, _src = hot_ctx
        r = enable_hot_reload(ctx, interval_s=0.05, background=True)
        assert r._thread is not None
        r.start()  # second start is a no-op
        r.stop()
        assert r._thread is None
        r.stop()  # second stop is a no-op

    def test_background_reload_applies(self, hot_ctx):
        ctx, src = hot_ctx
        r = enable_hot_reload(ctx, interval_s=0.05, background=True)
        try:
            _touch(src, PLUGIN_SRC_V2)
            deadline = time.time() + 5.0
            while time.time() < deadline and r.reload_count == 0:
                time.sleep(0.05)
            assert r.reload_count >= 1
            assert ctx.get_plugin("hot_data").version == "2.0.0"
        finally:
            r.stop()


class TestWatchBookkeeping:
    def test_watch_registered_counts_plugins(self, hot_ctx):
        ctx, _src = hot_ctx
        r = PluginHotReloader(ctx)
        assert r.watch_registered() >= 1
        # idempotent: re-watching adds nothing
        assert r.watch_registered() == 0
