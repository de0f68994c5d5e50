#!/usr/bin/env python
"""Doc-sync checker: fail when docs/plugins/ drifts from the code.

Reference analog: the doc-coverage CI workflow
(.github/workflows/docs-check.yml) + doc-sync checker scripts — regenerate
the plugin doc pages for the default profile into a temp dir and diff them
against the committed pages. Exit 0 when in sync, 1 with a per-file report
otherwise (run `waveform-docs --out-dir docs/plugins` to refresh).
"""

from __future__ import annotations

import argparse
import difflib
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--docs-dir", default="docs/plugins",
                    help="Committed generated-docs directory")
    ap.add_argument("--variant", default="human",
                    choices=["human", "agent", "both"])
    ap.add_argument("--show-diff", action="store_true",
                    help="Print unified diffs for drifted pages")
    args = ap.parse_args(argv)

    from waveformanalysis_tpu.context.context import Context
    from waveformanalysis_tpu.plugins.plugin_sets import tpu_default
    from waveformanalysis_tpu.utils.plugin_doc_generator import (
        PluginDocGenerator,
    )

    committed = Path(args.docs_dir)
    if not committed.exists():
        print(f"error: {committed} does not exist; generate docs first",
              file=sys.stderr)
        return 1

    with tempfile.TemporaryDirectory() as tmp:
        ctx = Context(storage_dir=tmp, config={"show_progress": False})
        ctx.register(*tpu_default())
        fresh_dir = Path(tmp) / "docs"
        PluginDocGenerator(ctx).generate_all(fresh_dir, variant=args.variant)

        fresh = {p.name: p.read_text() for p in sorted(fresh_dir.glob("*.md"))}
        old = {p.name: p.read_text() for p in sorted(committed.glob("*.md"))}

        drifted = []
        for name, text in fresh.items():
            if name not in old:
                drifted.append((name, "missing from committed docs"))
            elif old[name] != text:
                drifted.append((name, "content drift"))
        for name in old:
            if name not in fresh:
                drifted.append((name, "stale page (plugin removed?)"))

        if not drifted:
            print(f"doc-sync OK: {len(fresh)} pages match {committed}")
            return 0
        print(f"doc-sync FAILED: {len(drifted)} page(s) out of date:")
        for name, why in drifted:
            print(f"  {name}: {why}")
            if args.show_diff and name in old and name in fresh:
                diff = difflib.unified_diff(
                    old[name].splitlines(), fresh[name].splitlines(),
                    fromfile=f"committed/{name}", tofile=f"generated/{name}",
                    lineterm="",
                )
                for line in list(diff)[:60]:
                    print(f"    {line}")
        print("\nrefresh with: python -m waveformanalysis_tpu.utils.cli_docs generate "
              f"--out-dir {committed}")
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
