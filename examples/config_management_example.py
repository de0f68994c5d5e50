#!/usr/bin/env python
"""Config management: scoping, precedence, lineage-driven cache invalidation.

Shows the resolver's precedence (plugin-scoped dict > dotted key > global >
adapter-inferred > default), how plugin-scoped set_config merges one level,
and that changing a tracked option rotates the lineage key — so caches
invalidate exactly when results could differ
(reference analog: examples/config_management_example.py,
examples/list_plugin_configs_example.py).
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.builtin.basic_features import BasicFeaturesPlugin
from waveformanalysis_tpu.plugins.builtin.peak_finding import HitFinderPlugin
from waveformanalysis_tpu.testing.fixtures import make_fake_st_waveforms


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        ctx = Context(storage_dir=tmp, config={"show_progress": False})
        ctx.register(BasicFeaturesPlugin(), HitFinderPlugin())
        ctx.inject_data("r", "st_waveforms",
                        make_fake_st_waveforms(n_events=64))

        # ---- discovering options --------------------------------------
        print(ctx.help("hit"))

        # ---- scoped configuration -------------------------------------
        # plugin-scoped dict beats dotted key beats global key
        ctx.set_config({"hit": {"height": 50.0}})       # plugin-scoped
        ctx.set_config({"hit.distance": 4})              # dotted
        ctx.set_config({"prominence": 1.0})              # global fallback
        cfg = ctx._plugins["hit"].validate_config(ctx)
        print(f"resolved: height={cfg['height']} distance={cfg['distance']} "
              f"prominence={cfg['prominence']}")

        # scoped dicts MERGE one level: height survives this update
        ctx.set_config({"hit": {"width": 3}})
        cfg = ctx._plugins["hit"].validate_config(ctx)
        assert cfg["height"] == 50.0 and cfg["width"] == 3

        # ---- lineage + cache invalidation ------------------------------
        key_before = ctx.key_for("r", "hit")
        ctx.get_data("r", "hit")
        ctx.set_config({"hit": {"height": 80.0}})  # tracked option changes
        key_after = ctx.key_for("r", "hit")
        print(f"lineage key rotated: {key_before != key_after}")
        assert not ctx.cache_domain.is_cache_hit("r", "hit")

        # untracked/display options do NOT rotate lineage
        ctx.set_config({"show_progress": True})
        assert ctx.key_for("r", "hit") == key_after
        ctx.flush_saves()


if __name__ == "__main__":
    main()
