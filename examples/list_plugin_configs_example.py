#!/usr/bin/env python
"""Context.list_plugin_configs(): the option catalogue.

1. every registered plugin's options (default / current / modified flag),
2. how set_config changes show up,
3. single-plugin filtering and programmatic access.
(reference analog: examples/list_plugin_configs_example.py)
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.plugins.builtin.basic_features import (
    BasicFeaturesPlugin,
)
from waveformanalysis_tpu.plugins.builtin.peak_finding import HitFinderPlugin


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        ctx = Context(storage_dir=tmp, config={"show_progress": False})
        ctx.register(BasicFeaturesPlugin(), HitFinderPlugin())

        print("=" * 70)
        print("1. all plugins, defaults")
        print("=" * 70)
        ctx.list_plugin_configs()

        print()
        print("=" * 70)
        print("2. after set_config (see the * markers)")
        print("=" * 70)
        ctx.set_config({"hit": {"height": 123.0, "prominence": 9.0}})
        ctx.list_plugin_configs(plugin_name="hit")

        print()
        print("=" * 70)
        print("3. programmatic access (verbose=False)")
        print("=" * 70)
        info = ctx.list_plugin_configs(verbose=False)
        hit_opts = info["hit"]["options"]
        modified = {k: v["current_value"] for k, v in hit_opts.items()
                    if not v["is_default"]}
        print(f"hit v{info['hit']['version']}: {len(hit_opts)} options, "
              f"modified: {modified}")


if __name__ == "__main__":
    main()
